"""Int8 quantized serving path vs the f32 FrameTransformer forward."""

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.ops.masks import causal_mask
from sd_video_gen_tpu.ops.quantized import (quantize_weight, qdense,
                                            quantize_frame_transformer,
                                            quantized_ar_apply)


def test_qdense_accuracy(rng):
    x = jnp.asarray(rng.standard_normal((4, 7, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(32), jnp.float32)
    ref = x @ w + b
    out = qdense(x, quantize_weight(w), b)
    rel = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.03, rel


def test_quantized_forward_close_to_f32(rng):
    cfg = FrameTransformerConfig(latent_dim=64, dim_model=64, num_heads=4,
                                 num_encoder_layers=2, num_decoder_layers=2,
                                 dropout_p=0.0, dim_feedforward=128)
    model = FrameTransformer(cfg)
    src = jnp.asarray(rng.standard_normal((2, 6, 64)), jnp.float32)
    tgt = src[:, :-1]
    mask = causal_mask(5)
    params = model.init(jax.random.PRNGKey(0), src, tgt, tgt_mask=mask)
    ref = np.asarray(model.apply(params, src, tgt, tgt_mask=mask))

    qp = quantize_frame_transformer(params)
    out = np.asarray(quantized_ar_apply(qp, src, tgt, tgt_mask=mask,
                                        num_heads=4))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    # int8 per-channel weights + per-token activations: a few percent drift
    # through 4 quantized layers is expected; structure must match closely.
    assert rel < 0.15, rel
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr


def test_quantized_rollout_compatible(rng):
    """quantized_ar_apply slots into ar_rollout as apply_fn."""
    from sd_video_gen_tpu.ops.rollout import ar_rollout
    cfg = FrameTransformerConfig(latent_dim=32, dim_model=32, num_heads=4,
                                 num_encoder_layers=1, num_decoder_layers=1,
                                 dropout_p=0.0, dim_feedforward=64)
    model = FrameTransformer(cfg)
    ctx = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ctx, ctx)
    qp = quantize_frame_transformer(params)

    def apply_fn(qp, src, tgt, tgt_mask=None):
        return quantized_ar_apply(qp, src, tgt, tgt_mask=tgt_mask, num_heads=4)

    preds = ar_rollout(apply_fn, qp, ctx, pred_frames=3, window=5)
    assert preds.shape == (1, 3, 32)
    assert np.isfinite(np.asarray(preds)).all()
