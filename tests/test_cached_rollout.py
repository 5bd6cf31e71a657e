"""KV-cached incremental rollout vs the full re-forward numerics reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.ops.cached_rollout import cached_rollout, jit_cached_rollout
from sd_video_gen_tpu.ops.masks import causal_mask
from sd_video_gen_tpu.ops.rollout import ar_rollout


@pytest.fixture(scope="module")
def setup():
    cfg = FrameTransformerConfig(latent_dim=16, dim_model=32, num_heads=4,
                                 num_encoder_layers=2, num_decoder_layers=2,
                                 dropout_p=0.0, dim_feedforward=48,
                                 max_len=64)
    model = FrameTransformer(cfg)
    rng = np.random.default_rng(0)
    context = jnp.asarray(rng.standard_normal((2, 4, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), context, context,
                        tgt_mask=causal_mask(4))
    return cfg, model, params, context


def test_first_frame_exact_vs_ar_rollout(setup):
    """Step 1 is mathematically the same computation as the reference-style
    full forward: src = tgt = [SOS+context], causal mask, take last."""
    cfg, model, params, context = setup
    full = ar_rollout(model.apply, params, context, pred_frames=1, window=5)
    cached = cached_rollout(cfg, params, context, pred_frames=1)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


def test_all_steps_match_frozen_memory_full_forward(setup):
    """Every incremental step must equal the uncached frozen-memory decode:
    src fixed to the context, tgt grown with each prediction, full causal
    re-forward each step. This isolates the cache machinery (K/V updates,
    positions, masks) from the semantic difference vs ar_rollout."""
    cfg, model, params, context = setup
    P = 5
    cached = np.asarray(cached_rollout(cfg, params, context, pred_frames=P))

    tgt = context
    expected = []
    for _ in range(P):
        out = model.apply(params, context, tgt,
                          tgt_mask=causal_mask(tgt.shape[1]))
        nxt = out[:, -1:]
        expected.append(np.asarray(nxt[:, 0]))
        tgt = jnp.concatenate([tgt, nxt], axis=1)
    expected = np.stack(expected, axis=1)
    np.testing.assert_allclose(cached, expected, rtol=2e-4, atol=2e-4)


def test_jit_and_shapes(setup):
    cfg, model, params, context = setup
    fn = jit_cached_rollout(cfg, pred_frames=6)
    out = fn(params, context)
    assert out.shape == (2, 6, 16) and out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())


def test_bf16_params_run(setup):
    cfg, model, params, context = setup
    import dataclasses
    bcfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    bparams = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    out = cached_rollout(bcfg, bparams, context, pred_frames=3)
    assert out.shape == (2, 3, 16)
    assert bool(jnp.isfinite(out).all())


def test_max_len_guard(setup):
    cfg, model, params, context = setup
    with pytest.raises(AssertionError, match="max_len"):
        cached_rollout(cfg, params, context, pred_frames=61)


def test_int8_quantized_cached_rollout(setup):
    """int8 serving tree tracks the float cached rollout within quant noise."""
    from sd_video_gen_tpu.ops.cached_rollout import quantize_rollout_params

    cfg, model, params, context = setup
    base = np.asarray(cached_rollout(cfg, params, context, pred_frames=4))
    qp = quantize_rollout_params(params)
    quant = np.asarray(cached_rollout(cfg, qp, context, pred_frames=4))
    assert quant.shape == base.shape
    # dynamic per-token int8: small relative drift, same signal
    denom = np.maximum(np.abs(base), 1e-2)
    rel = np.abs(quant - base) / denom
    assert np.median(rel) < 0.08, float(np.median(rel))
    corr = np.corrcoef(base.ravel(), quant.ravel())[0, 1]
    assert corr > 0.99, corr


def test_cached_rollout_rejects_reference_pe():
    """pe_mode='reference_batch' checkpoints must not silently serve with
    timestep PE through the cached path (review regression)."""
    import dataclasses

    import pytest

    cfg = FrameTransformerConfig(latent_dim=16, dim_model=16, num_heads=2,
                                 num_encoder_layers=1, num_decoder_layers=1,
                                 dropout_p=0.0)
    cfg = dataclasses.replace(cfg, pe_mode="reference_batch")
    with pytest.raises(AssertionError, match="reference_batch"):
        cached_rollout(cfg, {"params": {}}, jnp.zeros((1, 3, 16)), 2)
