"""Fused (flash) attention for TPU via Pallas, with an XLA fallback.

Where it matters: the SD UNet/VAE *spatial* self-attention. At 512px the UNet
attends over 64x64 = 4096 tokens; materializing the (4096, 4096) probability
matrix costs 67MB f32 per head per item (the torch reference materializes it
— utils/sd_utils.py denoise path via diffusers attention). This kernel
computes attention with online softmax over key blocks, so only
(block_q, block_k) tiles ever exist in VMEM: O(T) memory instead of O(T²),
and the two matmuls hit the MXU back-to-back without an HBM round trip.

The frame transformer's sequences are <=16 tokens — far below the crossover —
so it keeps plain einsum attention (models/transformer.py). Dispatch policy
in ``attention``: Pallas on TPU for long sequences, einsum otherwise.

Kernel follows the pallas_guide.md patterns: f32 accumulators in VMEM,
grid over (batch*heads, query blocks), fori_loop over key blocks,
`preferred_element_type=jnp.float32` on every dot.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def reference_attention(q, k, v, scale=None):
    """(BH, T, d) einsum attention — the XLA fallback and test oracle."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum("btd,bsd->bts", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bts,bsd->btd", w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale          # (bq, d)
    bq, d = q.shape
    T = k_ref.shape[1]

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (bq, bk)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l, acc

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, T // block_k, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def flash_attention(q, k, v, scale: float | None = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False):
    """(BH, T, d) non-causal attention with O(T) memory.

    Requires T % block sizes == 0 (spatial token counts 64/256/1024/4096 all
    qualify); use ``attention`` for automatic fallback.
    """
    BH, T, d = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    block_q = min(block_q, T)
    block_k = min(block_k, T)
    kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(BH, T // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, T, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, T, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def attention(q, k, v, scale: float | None = None,
              min_flash_len: int = 1024, force: str | None = None):
    """Dispatch: Pallas flash kernel on TPU for long self-attention, einsum
    otherwise. q/k/v: (BH, T, d). ``force`` in {'flash','reference'} pins it."""
    T = q.shape[1]
    use_flash = (force == "flash" or
                 (force is None and _on_tpu() and q.shape == k.shape
                  and T >= min_flash_len and
                  T % min(DEFAULT_BLOCK_Q, T) == 0))
    if use_flash:
        return flash_attention(q, k, v, scale)
    return reference_attention(q, k, v, scale)
