"""Tensor-parallel sharding rules for the SD UNet and VAE.

r2 sharded only the frame transformer; the UNet — 78% of the denoise
pipeline's frame time — was replicated, so one denoise stream could never
use more than one chip. These tests validate the Megatron-style rules in
parallel/sharding.diffusion_param_shardings on the virtual 8-device mesh:
(a) kernels actually get sharded over 'model', (b) the sharded forward
matches the single-device forward, for both a reduced-width UNet denoise
scan and the VAE encode/decode.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sd_video_gen_tpu.models.unet import UNet2DCondition, UNetConfig
from sd_video_gen_tpu.models.vae import AutoencoderKL, VAEConfig
from sd_video_gen_tpu.parallel import make_mesh, diffusion_param_shardings


def _tiny_unet():
    cfg = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                     attention_heads=4, cross_attention_dim=32,
                     norm_num_groups=8)
    model = UNet2DCondition(cfg)
    z = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 2, 32))
    params = model.init(jax.random.PRNGKey(0), z,
                        jnp.zeros((1,), jnp.int32), ctx)
    return model, params


def _tiny_vae():
    cfg = VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                    norm_num_groups=8)
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def _spec_of(shardings, *path):
    node = shardings
    for p in path:
        node = node[p]
    return node.spec


def test_unet_rules_shard_megatron_pairs():
    mesh = make_mesh("data=2,model=4")
    model, params = _tiny_unet()
    sh = diffusion_param_shardings(mesh, params)
    p = sh["params"]
    # resnet: conv1 col (HWIO out), conv2 row (HWIO in)
    assert _spec_of(p, "down_0_res_0", "conv1", "kernel") == \
        P(None, None, None, "model")
    assert _spec_of(p, "down_0_res_0", "conv2", "kernel") == \
        P(None, None, "model", None)
    # temb injection matches conv1 layout
    assert _spec_of(p, "down_0_res_0", "time_emb_proj", "kernel") == \
        P(None, "model")
    # attention: qkv col, out row
    blk = p["down_0_attn_0"]["block_0"]
    assert blk["attn1"]["to_q"]["kernel"].spec == P(None, "model")
    assert blk["attn1"]["to_out_0"]["kernel"].spec == P("model", None)
    # GEGLU: proj col, out row
    assert blk["ff"]["geglu_proj_h"]["kernel"].spec == P(None, "model")
    assert blk["ff"]["geglu_proj_gate"]["kernel"].spec == P(None, "model")
    assert blk["ff"]["out_proj"]["kernel"].spec == P("model", None)
    # norms / biases / in-out convs replicated
    assert _spec_of(p, "conv_in", "kernel") == P()
    assert _spec_of(p, "down_0_res_0", "norm1", "scale") == P()


def test_unet_sharded_forward_matches_single_device(rng):
    model, params = _tiny_unet()
    z = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 2, 32)), jnp.float32)
    ref = jax.jit(model.apply)(params, z, t, ctx)

    for spec in ("data=1,model=8", "data=2,model=4"):
        mesh = make_mesh(spec)
        sharded = jax.device_put(params, diffusion_param_shardings(mesh, params))
        batch_sh = NamedSharding(mesh, P("data"))
        out = jax.jit(model.apply)(sharded, jax.device_put(z, batch_sh), t, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_vae_sharded_roundtrip_matches_single_device(rng):
    model, params = _tiny_vae()
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    enc_ref = jax.jit(lambda p, x: model.apply(p, x,
                                               method=AutoencoderKL.encode)[0]
                      )(params, x)
    dec_ref = jax.jit(lambda p, z: model.apply(p, z,
                                               method=AutoencoderKL.decode)
                      )(params, enc_ref)

    mesh = make_mesh("data=1,model=8")
    sh = diffusion_param_shardings(mesh, params)
    # rules bite: at least one col- and one row-parallel kernel in each of
    # encoder/decoder
    flat = jax.tree_util.tree_leaves_with_path(sh)
    specs = [l.spec for _, l in flat]
    assert any(s == P(None, None, None, "model") for s in specs)
    assert any(s == P(None, None, "model", None) for s in specs)

    sharded = jax.device_put(params, sh)
    enc = jax.jit(lambda p, x: model.apply(p, x,
                                           method=AutoencoderKL.encode)[0]
                  )(sharded, x)
    dec = jax.jit(lambda p, z: model.apply(p, z, method=AutoencoderKL.decode)
                  )(sharded, enc)
    np.testing.assert_allclose(np.asarray(enc), np.asarray(enc_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec_ref),
                               rtol=2e-4, atol=2e-5)


def test_denoise_scan_sharded_matches_single_device(rng):
    """One DDIM-style denoise scan (the UNet inside lax.scan, as the refine
    hook runs it) with model-sharded params == single-device."""
    model, params = _tiny_unet()
    z = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 2, 32)), jnp.float32)

    def scan_denoise(p, z):
        def body(x, t):
            eps = model.apply(p, x, jnp.broadcast_to(t, (x.shape[0],)), ctx)
            return x - 0.1 * eps, None
        out, _ = jax.lax.scan(body, z, jnp.arange(4, dtype=jnp.int32))
        return out

    ref = jax.jit(scan_denoise)(params, z)
    mesh = make_mesh("data=1,model=8")
    sharded = jax.device_put(params, diffusion_param_shardings(mesh, params))
    out = jax.jit(scan_denoise)(sharded, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_unet_tp_forward_head_sharded_attention(rng):
    """Model-parallel UNet forward with the head-sharded attention context:
    the spatial self-attentions run as shard_map over the model axis
    (per-device flash in interpret mode — the composition GSPMD cannot
    derive for a pallas_call) and must match the single-device forward."""
    from sd_video_gen_tpu.ops.attention import head_sharded_attention

    model, params = _tiny_unet()
    z = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 2, 32)), jnp.float32)
    ref = jax.jit(model.apply)(params, z, t, ctx)

    mesh = make_mesh("data=1,model=4", devices=jax.devices()[:4])
    sharded = jax.device_put(params, diffusion_param_shardings(mesh, params))
    for force in (None, "flash_interpret"):
        with head_sharded_attention(mesh, force=force):
            out = jax.jit(model.apply)(sharded, z, t, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_denoise_refiner_tensor_parallel_matches(rng):
    """The predict-CLI TP serving composition (--mesh data=1,model=N
    --denoise): refiner params sharded by the diffusion rules + the
    head-sharded attention context must reproduce the single-device
    refinement."""
    import pytest

    from sd_video_gen_tpu.config import Config
    from sd_video_gen_tpu.diffusion.refine import make_denoise_refiner
    from sd_video_gen_tpu.diffusion.sd import SDPipeline
    from sd_video_gen_tpu.models.clip_text import CLIPTextConfig
    from sd_video_gen_tpu.ops.attention import head_sharded_attention

    cfg = Config(config_name="t", frame_size=32)
    with pytest.warns(UserWarning, match="random init"):
        pipe = SDPipeline(
            frame_size=32,
            vae_cfg=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                              norm_num_groups=2),
            unet_cfg=UNetConfig(block_out_channels=(8, 16),
                                layers_per_block=1, attention_heads=2,
                                cross_attention_dim=16, norm_num_groups=2),
            clip_cfg=CLIPTextConfig(vocab_size=49408, hidden_size=16,
                                    num_layers=1, num_heads=2,
                                    intermediate_size=32, max_length=8))
    refine_apply, rp = make_denoise_refiner(cfg, start_step=3, pipeline=pipe,
                                            num_inference_steps=4, hi_res=32)
    L = pipe.vae.latent_dim
    flat = jnp.asarray(rng.standard_normal((2, L)), jnp.float32)
    ref = jax.jit(refine_apply)(rp, flat)

    mesh = make_mesh("data=1,model=2", devices=jax.devices()[:2])
    rp_s = jax.device_put(rp, diffusion_param_shardings(mesh, rp))
    with head_sharded_attention(mesh):
        out = jax.jit(refine_apply)(rp_s, flat)
    # tolerance as in test_denoise_refiner_round_trip: the 4-step DDIM
    # pixel round trip amplifies f32 reduction-order differences
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_vae_tp_ring_attention_matches(rng, monkeypatch):
    """Sharded VAE under the TP attention context: the single-head mid-block
    attention (head-batch == B, unsplittable) routes to sequence-parallel
    ring attention and the round trip must match single-device numerics."""
    import sd_video_gen_tpu.ops.attention as A

    model, params = _tiny_vae()
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    enc_ref = jax.jit(lambda p, x: model.apply(p, x,
                                               method=AutoencoderKL.encode)[0]
                      )(params, x)
    dec_ref = jax.jit(lambda p, z: model.apply(p, z,
                                               method=AutoencoderKL.decode)
                      )(params, enc_ref)

    monkeypatch.setattr(A, "RING_MIN_TOKENS", 8)  # per-device block at CPU size
    called = {}
    real_ring = A._ring_attention

    def spy(*a, **kw):
        called["ring"] = True
        return real_ring(*a, **kw)

    monkeypatch.setattr(A, "_ring_attention", spy)
    mesh = make_mesh("data=1,model=8")
    sharded = jax.device_put(params, diffusion_param_shardings(mesh, params))
    with A.head_sharded_attention(mesh):
        enc = jax.jit(lambda p, x: model.apply(
            p, x, method=AutoencoderKL.encode)[0])(sharded, x)
        dec = jax.jit(lambda p, z: model.apply(
            p, z, method=AutoencoderKL.decode))(sharded, enc)
    assert called.get("ring"), "ring path did not engage in the VAE mid block"
    np.testing.assert_allclose(np.asarray(enc), np.asarray(enc_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec_ref),
                               rtol=2e-4, atol=2e-5)


def test_tp_denoise_graph_has_no_involuntary_remat():
    """The 8-way model-parallel denoise scan must compile WITHOUT GSPMD
    'Involuntary full rematerialization' warnings (VERDICT r3 weak #3: the
    transitions at cross-attention head-split reshapes and the resnet
    time-emb broadcast bounced through replication — on real chips an
    all-gather per block). The warnings are emitted by C++ absl logging, so
    compile in a subprocess and grep its stderr."""
    import os
    import subprocess
    import sys

    code = r"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from sd_video_gen_tpu.models.unet import UNet2DCondition, UNetConfig
from sd_video_gen_tpu.parallel import make_mesh, diffusion_param_shardings
from sd_video_gen_tpu.ops.attention import head_sharded_attention

cfg = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                 attention_heads=4, cross_attention_dim=32,
                 norm_num_groups=8)
model = UNet2DCondition(cfg)
z = jnp.zeros((2, 8, 8, 4))
ctx = jnp.zeros((2, 2, 32))
params = model.init(jax.random.PRNGKey(0), z, jnp.zeros((2,), jnp.int32), ctx)
mesh = make_mesh("data=1,model=8")
params = jax.device_put(params, diffusion_param_shardings(mesh, params))

def scan_denoise(p, z):
    def body(x, t):
        eps = model.apply(p, x, jnp.broadcast_to(t, (x.shape[0],)), ctx)
        return x - 0.1 * eps, None
    out, _ = jax.lax.scan(body, z, jnp.arange(3, dtype=jnp.int32))
    return jnp.sum(jnp.abs(out))

with head_sharded_attention(mesh):
    compiled = jax.jit(scan_denoise).lower(params, z).compile()
txt = compiled.as_text()
print("compiled-ok allgathers=%d" % txt.count("all-gather"))
"""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    # Megatron pairing: the compiled graph's collectives are all-reduces
    # (one per block pair) + all-to-alls/permutes (head resharding) — an
    # all-gather means an activation bounced through replication
    assert "compiled-ok allgathers=0" in proc.stdout, proc.stdout[-500:]
    bad = [ln for ln in proc.stderr.splitlines()
           if "Involuntary full rematerialization" in ln]
    assert not bad, ("TP denoise graph re-grew SPMD full-remat warnings:\n"
                     + "\n".join(bad[:5]))


def test_unet_dp_tp_batch_stays_sharded(rng):
    """DP x TP: with the batch sharded over 'data' and params over 'model',
    the activation constraints (parallel/constrain.tp_constrain) must pin
    ONLY the feature/head dims — a P(None,...,axis) constraint would force
    the batch axis replicated (all-gather per block). Verifies numerics
    match single-device AND the output keeps its data sharding."""
    from sd_video_gen_tpu.ops.attention import head_sharded_attention

    model, params = _tiny_unet()
    z = jnp.asarray(rng.standard_normal((4, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([1, 3, 5, 7], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((4, 2, 32)), jnp.float32)
    ref = jax.jit(model.apply)(params, z, t, ctx)

    mesh = make_mesh("data=2,model=4")
    sharded = jax.device_put(params, diffusion_param_shardings(mesh, params))
    zb = jax.device_put(z, NamedSharding(mesh, P("data")))
    with head_sharded_attention(mesh):
        out = jax.jit(model.apply, out_shardings=NamedSharding(
            mesh, P("data")))(sharded, zb, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_dp_serving_denoise_has_zero_collectives(rng):
    """DP serving (replicated weights, batch over 'data') is the topology
    behind the 'v5e-8 = 8x the single-chip 9.86 f/s' extrapolation in
    BASELINE.md. Linear scaling holds iff the compiled per-step program has
    NO inter-device communication — certify it from the HLO: a denoise scan
    over an 8-way data mesh must contain zero all-reduce / all-gather /
    collective-permute / all-to-all ops, and its numerics must match the
    single-device program."""
    model, params = _tiny_unet()
    z = jnp.asarray(rng.standard_normal((8, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((8, 2, 32)), jnp.float32)

    def scan_denoise(p, z):
        def body(x, t):
            eps = model.apply(p, x, jnp.broadcast_to(t, (x.shape[0],)), ctx)
            return x - 0.1 * eps, None
        out, _ = jax.lax.scan(body, z, jnp.arange(3, dtype=jnp.int32))
        return out

    ref = jax.jit(scan_denoise)(params, z)

    mesh = make_mesh("data=8")
    repl = jax.device_put(params, NamedSharding(mesh, P()))
    zb = jax.device_put(z, NamedSharding(mesh, P("data")))
    compiled = (jax.jit(scan_denoise,
                        out_shardings=NamedSharding(mesh, P("data")))
                .lower(repl, zb).compile())
    txt = compiled.as_text()
    comm = {op: txt.count(op) for op in
            ("all-reduce", "all-gather", "collective-permute", "all-to-all")}
    assert not any(comm.values()), f"DP serving program communicates: {comm}"
    out = compiled(repl, zb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
