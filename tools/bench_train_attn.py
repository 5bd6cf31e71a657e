"""Train-side attention MXU-fill experiment (VERDICT r3 weak #6 / task 7).

The flagship train step runs 8-head attention over T=10 frame tokens at the
b288 knee: scores are (B*H=2304) independent 10x10 matmul outputs, each
filling 10/128 x 10/128 of an MXU output tile if XLA schedules one pass per
batch element. BASELINE.md attributes the train fwd/bwd MFU 0.49 to this
underfill *by argument*; this probe measures it.

Variants (numerically identical results, verified by tests/test_attn_pack.py):

  plain   — the shipped einsum pair (models/transformer.py:119-127)
  packed  — block-diagonal folding: P clips packed along the token axis so
            scores become (P*T x P*T) = 120x120 tiles (~94% lane fill) with
            an additive block-diag mask killing cross-clip attention. Trades
            P x more score FLOPs for dense MXU tiles — wins only if the
            plain path is pass-bound, not FLOP-bound.

Run on the chip:  python tools/bench_train_attn.py [--batch 288] [--pack 12]
Prints one JSON line per (variant, direction) with marginal micro-times and
the implied train-attention share of the knee step.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def plain_attention(q, k, v, mask=None):
    """(B, T, H, hd) x3 -> (B, T, H, hd); the shipped formulation."""
    hd = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def packed_attention(q, k, v, pack: int, mask=None):
    """Block-diagonal packing: fold ``pack`` clips along the token axis.

    (B, T, H, hd) -> (B/pack, pack*T, H, hd); the (pack*T)^2 score matrix is
    masked additively outside the diagonal blocks, so softmax and the
    weighted sum reproduce the per-clip result exactly (same f32 math — the
    extra masked columns contribute exp(-inf)=0)."""
    B, T, H, hd = q.shape
    assert B % pack == 0, f"batch {B} not divisible by pack {pack}"
    G, PT = B // pack, pack * T

    def fold(x):
        return x.reshape(G, PT, H, hd)

    qf, kf, vf = fold(q), fold(k), fold(v)
    clip = jnp.arange(PT) // T
    block = jnp.where(clip[:, None] == clip[None, :], 0.0, -jnp.inf)
    full = block.astype(jnp.float32)  # (PT, PT)
    if mask is not None:
        # the per-clip additive mask (e.g. causal TxT) repeats along the
        # diagonal blocks only; off-diagonal stays -inf from `block`.
        # NB: not kron(eye, mask) — 0 * -inf = NaN; select instead.
        same = clip[:, None] == clip[None, :]
        tiled = jnp.tile(mask.astype(jnp.float32), (pack, pack))
        full = full + jnp.where(same, tiled, 0.0)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    logits = logits + full
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(q.dtype), vf,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(B, T, H, hd)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=288)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=10)
    ap.add_argument("--head_dim", type=int, default=256)
    ap.add_argument("--pack", type=int, default=12,
                    help="clips per packed row (12*10=120 of 128 lanes)")
    ap.add_argument("--rep", type=int, default=32)
    args = ap.parse_args(argv)

    from tools._bench_harness import measure

    B, H, T, hd = args.batch, args.heads, args.tokens, args.head_dim
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.bfloat16)
    mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -jnp.inf)

    variants = {
        "plain": lambda q: plain_attention(q, k, v, mask),
        f"packed_{args.pack}": lambda q: packed_attention(
            q, k, v, args.pack, mask),
    }
    results = {}
    for name, fn in variants.items():
        fwd_us = measure(fn, q, rep=args.rep) * 1e6
        grad = jax.grad(lambda q: jnp.sum(fn(q).astype(jnp.float32)))
        bwd_us = measure(grad, q, rep=args.rep) * 1e6
        results[name] = {"fwd_us": round(fwd_us, 1),
                         "fwd_bwd_us": round(bwd_us, 1)}
        print(json.dumps({"variant": name, "shape": [B, T, H, hd],
                          **results[name]}), flush=True)

    base = results["plain"]["fwd_bwd_us"]
    packed = results[f"packed_{args.pack}"]["fwd_bwd_us"]
    # the flagship has 4 enc self + 8 dec self + 8 dec cross = 20 attention
    # sites; a knee step at 3195 clips/s / 288 = 11.1 steps/s = 90ms
    print(json.dumps({
        "summary": "per-attention-site fwd+bwd",
        "plain_us": base, "packed_us": packed,
        "packed_speedup": round(base / packed, 3),
        "est_step_share_plain_pct": round(20 * base / 90e3 * 100, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
