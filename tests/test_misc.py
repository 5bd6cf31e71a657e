"""Odds and ends: jit_rollout helper, I3D checkpoint-file load path,
compilation-cache helper."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.ops.rollout import ar_rollout, jit_rollout


def test_jit_rollout_helper(rng):
    cfg = FrameTransformerConfig(latent_dim=16, dim_model=16, num_heads=4,
                                 num_encoder_layers=1, num_decoder_layers=1,
                                 dropout_p=0.0, dim_feedforward=16)
    model = FrameTransformer(cfg)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ctx, ctx)
    f = jit_rollout(model.apply, pred_frames=2, window=5)
    out = f(params, ctx)
    ref = ar_rollout(model.apply, params, ctx, 2, window=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_load_i3d_from_torch_file(tmp_path, rng):
    """eval CLI --i3d_weights path: torch .pt state dict -> converted params."""
    from sd_video_gen_tpu.models.i3d import InceptionI3d, I3DConfig
    from sd_video_gen_tpu.evaluation.predict_fvd import load_i3d

    # fabricate a correctly-shaped torch state dict from our param tree
    model = InceptionI3d(I3DConfig())
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 9, 224, 224, 3), jnp.float32))
    sd = {}
    p = shapes["params"]

    def emit(prefix, unit):
        kt, kh, kw, ci, co = unit["conv3d"]["kernel"].shape
        sd[prefix + ".conv3d.weight"] = torch.zeros(co, ci, kt, kh, kw)
        if "bias" in unit["conv3d"]:
            sd[prefix + ".conv3d.bias"] = torch.zeros(co)
        if "bn_scale" in unit:
            for tname, oname in [("weight", "bn_scale"), ("bias", "bn_bias"),
                                 ("running_mean", "bn_mean"),
                                 ("running_var", "bn_var")]:
                sd[prefix + ".bn." + tname] = torch.zeros(
                    unit[oname].shape[0])

    from sd_video_gen_tpu.models.i3d import _MIXED
    for name in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3", "logits"):
        emit(name, p[name])
    for name, _ in _MIXED:
        for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            emit(f"{name}.{b}", p[name][b])
    path = tmp_path / "i3d.pt"
    torch.save(sd, str(path))

    i3d, params = load_i3d(str(path))
    got = jax.tree.map(lambda a: a.shape, params)
    want = jax.tree.map(lambda a: a.shape, dict(shapes))
    assert got == want


def test_compilation_cache_helper(tmp_path, monkeypatch):
    from sd_video_gen_tpu.utils.cache import enable_compilation_cache
    monkeypatch.delenv("SDVG_NO_COMPILATION_CACHE", raising=False)
    p = enable_compilation_cache(str(tmp_path / "cache"))
    assert p is not None
    monkeypatch.setenv("SDVG_NO_COMPILATION_CACHE", "1")
    assert enable_compilation_cache() is None


def test_profiler_trace_writes(tmp_path):
    from sd_video_gen_tpu.utils.profiling import trace, StepTimer, annotate
    with trace(str(tmp_path)) as d:
        with annotate("unit"):
            _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    import os
    assert any(os.scandir(d))  # trace artifacts written
    t = StepTimer()
    t.start(); t.stop()
    s = t.summary()
    assert s["steps_timed"] == 1 and s["step_ms_mean"] >= 0


def test_fvd_from_files_numeric_order_and_grouping(tmp_path):
    """Frame files sort numerically (predict writes unpadded <i>.png — a
    lexicographic sort temporally scrambles videos) and sequences never
    straddle directory boundaries (review regressions)."""
    import cv2

    from sd_video_gen_tpu.evaluation.compute_fvd_from_files import (
        _frame_key, _load_sequences)

    assert sorted(["10.png", "9.png", "2.png"], key=_frame_key) == \
        ["2.png", "9.png", "10.png"]
    # two videos x 5 frames; seq_len 4 must yield one seq per video (no
    # splice), each in numeric order
    for vid in ("a", "b"):
        d = tmp_path / vid
        d.mkdir()
        for i in range(5):
            img = np.full((8, 8, 3), i if vid == "a" else 100 + i, np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), img)
    seqs = _load_sequences(str(tmp_path), seq_len=4, max_seqs=10, size=8)
    assert seqs.shape == (2, 4, 8, 8, 3)
    np.testing.assert_array_equal(seqs[0, :, 0, 0, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(seqs[1, :, 0, 0, 0], [100, 101, 102, 103])
