"""Latent-space training losses as pure jittable functions.

Reference semantics:
  - MSE / L1: trainers/trainer.py:103-104 (torch defaults: mean reduction)
  - Gradient-difference loss: trainers/trainer.py:65-83
  - BiPatchNCE: models/contrastive_loss.py:28-60 (gradient stopped on negatives)
  - Composite: trainers/trainer.py:88-109

All functions take batch-first ``(B, K, latent_dim)`` arrays where
``latent_dim = 4*h*w`` is a flattened SD frame latent. (The reference used
seq-first tensors; every loss here is permutation-invariant over the leading
two axes, so the results are identical.) Computation is done in float32 for
stable reductions regardless of the model's compute dtype.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean(jnp.square(pred - target))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean(jnp.abs(pred - target))


def _to_spatial(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4*h*w) -> (..., 4, h, w) with h == w (SD latent layout)."""
    hw = int(round((x.shape[-1] // 4) ** 0.5))
    return x.reshape(x.shape[:-1] + (4, hw, hw))


def gradient_difference_loss(pred: jnp.ndarray, target: jnp.ndarray,
                             alpha: float = 1.0) -> jnp.ndarray:
    """GDL: | |∇pred| - |∇target| | ** alpha summed over v+h gradients, / pred.size.

    Matches trainers/trainer.py:65-83 including its normalization by the
    *flattened* element count (not the gradient-tensor count).
    """
    x = _to_spatial(pred.astype(jnp.float32))
    y = _to_spatial(target.astype(jnp.float32))
    gvx = x[..., 1:, :] - x[..., :-1, :]
    gvy = y[..., 1:, :] - y[..., :-1, :]
    ghx = x[..., :, 1:] - x[..., :, :-1]
    ghy = y[..., :, 1:] - y[..., :, :-1]
    v = jnp.abs(jnp.abs(gvx) - jnp.abs(gvy))
    h = jnp.abs(jnp.abs(ghx) - jnp.abs(ghy))
    gd = jnp.sum(jnp.power(v, alpha)) + jnp.sum(jnp.power(h, alpha))
    return gd / pred.size


def bipatch_nce_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     temperature: float = 0.07) -> jnp.ndarray:
    """Bidirectional patchwise NCE over latent patches.

    Matches models/contrastive_loss.py:28-60: patches of the same (frame,
    position) are positives (identity mask); gradients are stopped through the
    second operand on negative pairs; cross-entropy over the h*w-way logits in
    both directions, averaged.

    pred/target: (B, K, latent_dim); internally (B*K, h*w, 4) patch features.
    """
    p = _to_spatial(pred.astype(jnp.float32))   # (B, K, C, h, w)
    g = _to_spatial(target.astype(jnp.float32))
    B, K, C, h, w = p.shape
    p = p.reshape(B * K, C, h * w).transpose(0, 2, 1)  # (M, P, C)
    g = g.reshape(B * K, C, h * w).transpose(0, 2, 1)
    P = h * w
    eye = jnp.eye(P, dtype=p.dtype)

    def _ce(scores: jnp.ndarray) -> jnp.ndarray:
        # scores: (M, P, P); target class for row i is i.
        logz = jax.nn.logsumexp(scores, axis=-1)            # (M, P)
        diag = jnp.diagonal(scores, axis1=-2, axis2=-1)      # (M, P)
        return jnp.mean(logz - diag)

    def _dir(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        # diag pairs keep gradient through b; off-diag pairs stop it.
        # Only the DIAGONAL of the with-gradient similarity is ever used,
        # so compute it directly as an (M,P) einsum instead of a second
        # full (M,P,P) matmul (halves the contrastive term's matmul cost;
        # identical values and gradients: the -d_sg/+diag_grad pair is
        # numerically zero but swaps the diagonal's gradient path to b).
        s_sg = jnp.einsum("mpc,mqc->mpq", a, jax.lax.stop_gradient(b))
        diag_grad = jnp.einsum("mpc,mpc->mp", a, b)
        d_sg = jnp.diagonal(s_sg, axis1=-2, axis2=-1)
        scores = (s_sg + (diag_grad - d_sg)[:, :, None] * eye) / temperature
        return _ce(scores)

    return 0.5 * (_dir(g, p) + _dir(p, g))


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Static loss-mix configuration (one per training run)."""
    use_mse: bool = True
    use_l1: bool = False
    use_gdl: bool = True
    lambda_gdl: float = 1.0
    alpha: float = 1.0
    use_contrastive: bool = True
    lambda_contrastive: float = 0.025
    temperature: float = 0.07

    @classmethod
    def from_config(cls, cfg) -> "LossWeights":
        return cls(
            use_mse=cfg.use_mse, use_l1=cfg.use_l1,
            use_gdl=cfg.use_gdl, lambda_gdl=cfg.lambda_gdl, alpha=cfg.alpha,
            use_contrastive=cfg.use_contrastive,
            lambda_contrastive=cfg.lambda_contrastive,
            temperature=cfg.temperature,
        )


def composite_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   w: LossWeights) -> tuple[jnp.ndarray, dict]:
    """use_mse*MSE + use_L1*L1 + use_gdl*λ*GDL + use_contrastive*λc*BiPatchNCE.

    Returns (total, components) — components are always materialized for the
    metrics logger (the reference recomputed them per step on host:
    trainers/trainer.py:168-178). Branches are Python-static so XLA only
    compiles the enabled terms.
    """
    comps = {}
    total = jnp.float32(0.0)
    if w.use_mse:
        comps["mse"] = mse_loss(pred, target)
        total = total + comps["mse"]
    if w.use_l1:
        comps["l1"] = l1_loss(pred, target)
        total = total + comps["l1"]
    if w.use_gdl:
        comps["gdl"] = gradient_difference_loss(pred, target, w.alpha)
        total = total + w.lambda_gdl * comps["gdl"]
    if w.use_contrastive:
        comps["contrastive"] = bipatch_nce_loss(pred, target, w.temperature)
        total = total + w.lambda_contrastive * comps["contrastive"]
    comps["total"] = total
    return total, comps
