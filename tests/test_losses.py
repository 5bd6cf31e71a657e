"""Numerical parity of loss functions vs torch implementations of the
reference formulas (trainers/trainer.py:65-109, models/contrastive_loss.py:28-60)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from sd_video_gen_tpu.ops.losses import (
    mse_loss, l1_loss, gradient_difference_loss, bipatch_nce_loss,
    composite_loss, LossWeights,
)

B, K, C, H, W = 2, 3, 4, 8, 8
LAT = C * H * W


def _data(rng):
    x = rng.standard_normal((B, K, LAT)).astype(np.float32)
    y = rng.standard_normal((B, K, LAT)).astype(np.float32)
    return x, y


def torch_gdl(x, y, alpha):
    # Reference formula, trainers/trainer.py:65-83.
    fx = torch.reshape(x, (x.shape[0], x.shape[1], 4, H, W))
    fy = torch.reshape(y, (y.shape[0], y.shape[1], 4, H, W))
    vg = torch.abs(torch.abs(fx[:, :, :, 1:, :] - fx[:, :, :, :-1, :])
                   - torch.abs(fy[:, :, :, 1:, :] - fy[:, :, :, :-1, :]))
    hg = torch.abs(torch.abs(fx[:, :, :, :, 1:] - fx[:, :, :, :, :-1])
                   - torch.abs(fy[:, :, :, :, 1:] - fy[:, :, :, :, :-1]))
    return (torch.sum(vg ** alpha) + torch.sum(hg ** alpha)) / x.numel()


def torch_bipatch_nce(pred, gt, temperature):
    # Reference formula, models/contrastive_loss.py:28-60.
    N, T = pred.shape[0], pred.shape[1]
    p = pred.reshape(N, T, 4, H, W).reshape(N * T, 4, H * W).permute(0, 2, 1)
    g = gt.reshape(N, T, 4, H, W).reshape(N * T, 4, H * W).permute(0, 2, 1)
    mask = torch.eye(H * W).unsqueeze(0).repeat(N * T, 1, 1)
    s1 = torch.matmul(g, p.transpose(1, 2)) * mask \
        + torch.matmul(g, p.detach().transpose(1, 2)) * (1 - mask)
    s2 = torch.matmul(p, g.transpose(1, 2)) * mask \
        + torch.matmul(p, g.detach().transpose(1, 2)) * (1 - mask)
    target = torch.argmax((mask == 1).int().flatten(0, 1), dim=1)
    loss1 = torch.nn.CrossEntropyLoss()((s1 / temperature).flatten(0, 1), target)
    loss2 = torch.nn.CrossEntropyLoss()((s2 / temperature).flatten(0, 1), target)
    return 0.5 * (loss1 + loss2)


def test_mse_l1(rng):
    x, y = _data(rng)
    tx, ty = torch.tensor(x), torch.tensor(y)
    np.testing.assert_allclose(float(mse_loss(x, y)), float(F.mse_loss(tx, ty)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(l1_loss(x, y)), float(F.l1_loss(tx, ty)),
                               rtol=1e-5)


def test_gdl_parity(rng):
    x, y = _data(rng)
    for alpha in (1.0, 2.0):
        ours = float(gradient_difference_loss(x, y, alpha))
        ref = float(torch_gdl(torch.tensor(x), torch.tensor(y), alpha))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bipatch_nce_parity(rng):
    x, y = _data(rng)
    ours = float(bipatch_nce_loss(x, y, 0.07))
    ref = float(torch_bipatch_nce(torch.tensor(x), torch.tensor(y), 0.07))
    # logits are scaled by 1/temperature (~14x); fp32 matmul accumulation
    # differences between XLA and torch leave ~2e-4 relative noise.
    np.testing.assert_allclose(ours, ref, rtol=1e-3)


def test_bipatch_nce_gradient_stopping(rng):
    """Negatives must not receive gradient through the stop-grad operand."""
    x, y = _data(rng)
    tx = torch.tensor(x, requires_grad=True)
    ty = torch.tensor(y)
    torch_bipatch_nce(tx, ty, 0.07).backward()
    ref_grad = tx.grad.numpy()

    g = jax.grad(lambda p: bipatch_nce_loss(p, jnp.asarray(y), 0.07))(jnp.asarray(x))
    # fp32 softmax of 1/temperature-scaled logits leaves ~2e-3 relative noise
    # between XLA and torch; a missing stop_gradient would change the result
    # by O(1), which this still catches.
    np.testing.assert_allclose(np.asarray(g), ref_grad, rtol=2e-2, atol=2e-4)


def test_composite_matches_sum(rng):
    x, y = _data(rng)
    w = LossWeights(use_mse=True, use_l1=True, use_gdl=True, lambda_gdl=0.5,
                    alpha=1.0, use_contrastive=True, lambda_contrastive=0.025)
    total, comps = composite_loss(x, y, w)
    expect = (comps["mse"] + comps["l1"] + 0.5 * comps["gdl"]
              + 0.025 * comps["contrastive"])
    np.testing.assert_allclose(float(total), float(expect), rtol=1e-6)
    # disabled terms are not computed
    w2 = LossWeights(use_mse=True, use_l1=False, use_gdl=False,
                     use_contrastive=False)
    _, comps2 = composite_loss(x, y, w2)
    assert set(comps2) == {"mse", "total"}
