"""FVD subsystem: I3D parity vs torch ops, stats streaming/psum, Fréchet math."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from sd_video_gen_tpu.models.i3d import (InceptionI3d, I3DConfig, Unit3D,
                                         convert_i3d, _MIXED)
from sd_video_gen_tpu.evaluation.fvd import (FeatureStats, frechet_distance,
                                             compute_fvd, preprocess_videos)


def test_unit3d_same_padding_matches_torch(rng):
    """XLA 'SAME' padding == the TF-style dynamic padding the torch code
    hand-rolls (pytorch_i3d.py:80-105), for odd kernels and stride 2."""
    x = rng.standard_normal((1, 5, 9, 9, 2)).astype(np.float32)
    tconv = torch.nn.Conv3d(2, 4, (3, 3, 3), stride=(2, 2, 2), padding=0,
                            bias=False)
    torch.manual_seed(0)
    torch.nn.init.normal_(tconv.weight)

    # torch: manual TF-same pad then conv
    tx = torch.tensor(x.transpose(0, 4, 1, 2, 3))
    k, s = 3, 2
    def pad_amt(sz):
        return max(k - s, 0) if sz % s == 0 else max(k - (sz % s), 0)
    pt, ph, pw = pad_amt(5), pad_amt(9), pad_amt(9)
    tx = F.pad(tx, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2,
                    pt // 2, pt - pt // 2))
    with torch.no_grad():
        ref = tconv(tx).numpy()

    unit = Unit3D(I3DConfig(), 4, (3, 3, 3), (2, 2, 2), use_bn=False,
                  relu=False)
    params = {"params": {"conv3d": {"kernel": jnp.asarray(
        tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0))}}}
    ours = unit.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 4, 1, 2, 3), ref,
                               rtol=1e-4, atol=1e-5)


def test_i3d_shapes_and_converter_roundtrip(rng):
    cfg = I3DConfig(num_classes=400)
    model = InceptionI3d(cfg)
    x = jnp.asarray(rng.standard_normal((1, 9, 224, 224, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (1, 400)

    # converter round trip: fabricate a torch-style sd from our params
    sd = {}
    def emit(prefix, unit):
        sd[prefix + ".conv3d.weight"] = np.transpose(
            np.asarray(unit["conv3d"]["kernel"]), (4, 3, 0, 1, 2))
        if "bias" in unit["conv3d"]:
            sd[prefix + ".conv3d.bias"] = np.asarray(unit["conv3d"]["bias"])
        if "bn_scale" in unit:
            sd[prefix + ".bn.weight"] = np.asarray(unit["bn_scale"])
            sd[prefix + ".bn.bias"] = np.asarray(unit["bn_bias"])
            sd[prefix + ".bn.running_mean"] = np.asarray(unit["bn_mean"])
            sd[prefix + ".bn.running_var"] = np.asarray(unit["bn_var"])
    p = params["params"]
    for name in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3", "logits"):
        emit(name, p[name])
    for name, _ in _MIXED:
        for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            emit(f"{name}.{b}", p[name][b])
    params2 = convert_i3d(sd)
    out2 = model.apply(params2, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(logits),
                               rtol=1e-5, atol=1e-6)


def test_preprocess_videos(rng):
    v = rng.integers(0, 255, (2, 3, 112, 168, 3)).astype(np.uint8)
    out = preprocess_videos(jnp.asarray(v))
    assert out.shape == (2, 3, 224, 224, 3)
    o = np.asarray(out)
    assert o.min() >= -1.0 and o.max() <= 1.0
    assert o.std() > 0.1  # not degenerate


def test_feature_stats_match_direct(rng):
    feats = rng.standard_normal((100, 8)).astype(np.float32)
    st = FeatureStats(8)
    for i in range(0, 100, 32):
        st = st.append(jnp.asarray(feats[i:i + 32]))
    mu, cov = st.mean_cov()
    np.testing.assert_allclose(np.asarray(mu), feats.mean(0), atol=1e-5)
    ref_cov = np.cov(feats, rowvar=False, bias=True)
    np.testing.assert_allclose(np.asarray(cov), ref_cov, atol=1e-4)


def test_feature_stats_psum_across_mesh(rng):
    feats = rng.standard_normal((8, 4)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()), ("d",))

    def per_device(f):
        st = FeatureStats(4).append(f)
        st = st.psum("d")
        return st.n, st.raw_sum, st.raw_prod

    n, s, pmat = jax.jit(shard_map(per_device, mesh=mesh,
                                   in_specs=P("d"), out_specs=P()))(
        jnp.asarray(feats))
    np.testing.assert_allclose(float(n), 8.0)
    np.testing.assert_allclose(np.asarray(s), feats.sum(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pmat), feats.T @ feats, atol=1e-4)


def test_frechet_identical_is_zero(rng):
    x = rng.standard_normal((500, 16))
    assert abs(frechet_distance(x, x.copy())) < 1e-6


def test_frechet_known_gaussians(rng):
    """For isotropic gaussians N(0,I) vs N(m,I): FD ~= ||m||^2."""
    x = rng.standard_normal((20000, 4))
    y = rng.standard_normal((20000, 4)) + np.array([1.0, 0, 0, 0])
    fd = frechet_distance(x, y)
    assert abs(fd - 1.0) < 0.1


def test_two_fvd_lineages_agree(rng):
    """Streaming-stats scipy-sqrtm FVD vs batch SVD FVD on the same data
    (the reference kept both implementations as a cross-check)."""
    x = rng.standard_normal((1000, 8)).astype(np.float32)
    y = (rng.standard_normal((1000, 8)) * 1.3 + 0.5).astype(np.float32)
    batch_fd = frechet_distance(x, y)
    sx = FeatureStats(8).append(jnp.asarray(x))
    sy = FeatureStats(8).append(jnp.asarray(y))
    stream_fd = compute_fvd(sx, sy)
    # population vs Bessel cov differ by O(1/N)
    np.testing.assert_allclose(stream_fd, batch_fd, rtol=0.02)


def test_i3d_temporal_minimum_is_nine():
    """T=9 is the REAL temporal floor of the I3D graph: shorter clips
    collapse to zero frames in the temporal pool chain and every feature
    goes NaN (an earlier min_t=5 assumption silently produced FVD=nan in
    the training hook). The hook tiles to 9 — this pins both facts."""
    from sd_video_gen_tpu.evaluation.predict_fvd import load_i3d
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("ignore")
        i3d, ip = load_i3d(None)
    rng = np.random.default_rng(0)
    x5 = jnp.asarray(rng.integers(0, 255, (1, 5, 32, 32, 3)), jnp.uint8)
    f5 = np.asarray(i3d.apply(ip, preprocess_videos(x5)))
    assert not np.isfinite(f5).all()  # documents WHY the hook tiles

    # the hook's tiling formula on a k=2 clip
    v = jnp.asarray(rng.integers(0, 255, (1, 2, 32, 32, 3)), jnp.uint8)
    reps = -(-9 // v.shape[1])
    v9 = jnp.tile(v, (1, reps, 1, 1, 1))[:, :9]
    f9 = np.asarray(i3d.apply(ip, preprocess_videos(v9)))
    assert np.isfinite(f9).all()


def test_feature_stats_f64_host_accumulation():
    """Cross-batch accumulation on host must be float64: I3D logits are not
    zero-centered, so the population-cov subtraction cancels away most of
    f32's digits at realistic sample counts (review regression)."""
    rng = np.random.default_rng(0)
    # large common offset: exactly the cancellation-hostile regime
    feats = rng.standard_normal((4000, 8)).astype(np.float32) + 300.0
    st = FeatureStats(8)
    for i in range(0, 4000, 50):
        st = st.append(jnp.asarray(feats[i:i + 50]))
    assert st.raw_prod.dtype == np.float64
    mu, cov = st.mean_cov()
    ref_mu = feats.astype(np.float64).mean(0)
    d = feats.astype(np.float64) - ref_mu
    ref_cov = d.T @ d / len(feats)
    np.testing.assert_allclose(np.asarray(mu), ref_mu, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(cov), ref_cov, rtol=1e-6, atol=1e-6)
