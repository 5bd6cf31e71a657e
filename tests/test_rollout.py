"""AR rollout: scan vs step-by-step python reference, identity model sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.models import (FrameTransformer, FrameTransformerConfig,
                                     IdentityModel)
from sd_video_gen_tpu.ops.masks import causal_mask
from sd_video_gen_tpu.ops.rollout import ar_rollout

LAT = 32


def _model_and_params(rng):
    cfg = FrameTransformerConfig(latent_dim=LAT, dim_model=32, num_heads=4,
                                 num_encoder_layers=1, num_decoder_layers=1,
                                 dropout_p=0.0, dim_feedforward=32)
    model = FrameTransformer(cfg)
    src = jnp.asarray(rng.standard_normal((1, 6, LAT)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), src, src,
                        tgt_mask=causal_mask(6))
    return model, params, src


def _python_rollout(model, params, context, pred_frames, window=5):
    """Step-by-step loop replicating prediction/predict.py:143-196."""
    X = context
    frames = context[:, 1:]
    preds = []
    for it in range(pred_frames):
        mask = causal_mask(X.shape[1])
        out = model.apply(params, X, X, tgt_mask=mask)
        nxt = out[:, -1]
        preds.append(nxt)
        all_latents = jnp.concatenate(
            [frames[:, :-1], jnp.stack(preds, axis=1)], axis=1)
        X = all_latents[:, -window:]
    return jnp.stack(preds, axis=1)


def test_scan_rollout_matches_python_loop(rng):
    model, params, context = _model_and_params(rng)
    ours = ar_rollout(model.apply, params, context, pred_frames=4, window=5)
    ref = _python_rollout(model, params, context, pred_frames=4, window=5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_rollout_single_frame(rng):
    model, params, context = _model_and_params(rng)
    out = ar_rollout(model.apply, params, context, pred_frames=1)
    assert out.shape == (1, 1, LAT)


def test_rollout_identity_model(rng):
    model = IdentityModel()
    context = jnp.asarray(rng.standard_normal((2, 6, LAT)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), context, context)
    preds = ar_rollout(model.apply, params, context, pred_frames=3, window=5)
    # identity predicts last frame forever
    for t in range(3):
        np.testing.assert_allclose(np.asarray(preds[:, t]),
                                   np.asarray(context[:, -1]), rtol=1e-6)


def test_rollout_jits_once(rng):
    model, params, context = _model_and_params(rng)
    calls = 0
    def counting_apply(p, s, t, tgt_mask=None):
        nonlocal calls
        calls += 1
        return model.apply(p, s, t, tgt_mask=tgt_mask)
    f = jax.jit(lambda p, c: ar_rollout(counting_apply, p, c, pred_frames=8))
    f(params, context)
    # trace-time calls: step0 + one scan body trace (not 8)
    assert calls <= 3
