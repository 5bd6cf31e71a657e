"""Autoregressive rollout as a single fixed-shape lax.scan.

The reference's inference loop (prediction/predict.py:143-196) re-runs the
whole encoder+decoder per predicted frame from Python, with >=6 host<->device
round-trips per frame when --denoise is on. Here the entire rollout — sliding
window, per-step refine (denoise) hook included — is one jitted program:

  step 0: condition on [SOS + all context frames] (reference X = new_batch
          with SOS on the first iteration)
  steps 1..P-1: sliding window of the last `window` latents
          (reference X = all_latents[:, -5:])

The window buffer has a static shape, so XLA compiles one step body and scans
it; no recompilation per frame count.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sd_video_gen_tpu.ops.masks import causal_mask


def _predict_next(apply_fn, params, seq, refine_fn, model_kwargs, step):
    """Full-sequence forward, take the last predicted latent (predict.py:16-42).

    ``step`` is the rollout step index, forwarded to the refine hook so the
    partial-denoise draws fresh noise per frame (the reference called
    torch.randn anew for every prediction)."""
    mask = causal_mask(seq.shape[1])
    pred = apply_fn(params, seq, seq, tgt_mask=mask, **model_kwargs)
    nxt = pred[:, -1]
    if refine_fn is not None:
        nxt = refine_fn(nxt, step)
    return nxt


def ar_rollout(apply_fn: Callable, params, context: jnp.ndarray,
               pred_frames: int, window: int = 5,
               refine_fn: Optional[Callable] = None,
               model_kwargs: Optional[dict] = None) -> jnp.ndarray:
    """Roll the model forward ``pred_frames`` steps.

    Args:
      apply_fn: model.apply-compatible callable (params, src, tgt, tgt_mask=...).
      context: (B, T0, L) — SOS + context-frame latents (encode_batch output).
      pred_frames: number of latents to generate (static).
      window: sliding context window in frames (reference keeps the last 5).
      refine_fn: optional (latents (B, L), step) -> (B, L) per-step hook
        (partial denoise; step indexes the rollout for per-frame noise keys).

    Returns: (B, pred_frames, L) predicted latents.
    """
    model_kwargs = model_kwargs or {}
    B, T0, L = context.shape

    # Step 0 on [SOS + context] exactly as the reference's first iteration.
    first = _predict_next(apply_fn, params, context, refine_fn, model_kwargs,
                          jnp.int32(0))

    # Subsequent steps slide over real frames only (no SOS): buffer holds the
    # last `window` latents of (context-without-SOS minus last) + preds.
    frames = context[:, 1:]  # drop SOS
    hist = jnp.concatenate([frames[:, :-1], first[:, None]], axis=1)
    buf = hist[:, -window:]
    if buf.shape[1] < window:
        # left-pad by repeating the first frame so the scan buffer has a
        # static shape. Documented deviation for SHORT contexts only (the
        # reference always feeds exactly frames_per_clip frames, where no
        # padding occurs): its Python loop would attend a shorter window,
        # here the duplicated first frame participates in attention and
        # shifts positional slots until real frames fill the buffer.
        pad = jnp.repeat(buf[:, :1], window - buf.shape[1], axis=1)
        buf = jnp.concatenate([pad, buf], axis=1)

    def step(buf, i):
        nxt = _predict_next(apply_fn, params, buf, refine_fn, model_kwargs, i)
        buf = jnp.concatenate([buf[:, 1:], nxt[:, None]], axis=1)
        return buf, nxt

    if pred_frames == 1:
        return first[:, None]
    _, rest = jax.lax.scan(step, buf, jnp.arange(1, pred_frames))
    rest = jnp.moveaxis(rest, 0, 1)  # (B, P-1, L)
    return jnp.concatenate([first[:, None], rest], axis=1)


def jit_rollout(apply_fn, pred_frames: int, window: int = 5, refine_fn=None):
    """Convenience: jitted rollout with static frame count."""
    f = partial(ar_rollout, apply_fn, pred_frames=pred_frames, window=window,
                refine_fn=refine_fn)
    return jax.jit(lambda params, context: f(params, context))
