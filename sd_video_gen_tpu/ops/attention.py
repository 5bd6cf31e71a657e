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

Kernel follows the pallas_guide.md patterns: f32 accumulators in VMEM
scratch, grid (batch*heads, query blocks, key blocks) with the key dim
innermost so K/V stream through VMEM one block at a time (the first version
block-spec'd the FULL (T, d) K/V per grid step: at the 512px VAE shape
4096x512 f32 that is 8MB each and blew the 16MB VMEM scoped limit on v5e —
caught by tools/rehearse_real_weights.py), and
`preferred_element_type=jnp.float32` on every dot.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def auto_blocks(T: int, d: int) -> tuple[int, int]:
    """Pick (block_q, block_k) for a (•, T, d) attention.

    Small head dims leave the MXU contraction lanes mostly idle, so the win
    comes from amortizing grid/step overhead with LARGE blocks: at
    (8, 4096, 40) bf16, 1024x1024 blocks run 1.4x faster than 256x256
    (measured, PARITY.md). VMEM bound: the (bq, bk) f32 logits tile plus
    q/k/v/acc tiles must fit ~16MB, so wide heads fall back to 256."""
    if d <= 128:
        return min(1024, T), min(1024, T)
    return min(DEFAULT_BLOCK_Q, T), min(DEFAULT_BLOCK_K, T)


def reference_attention(q, k, v, scale=None):
    """(BH, T, d) einsum attention — the XLA fallback and test oracle."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum("btd,bsd->bts", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bts,bsd->btd", w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, n_k: int):
    """One (query-block, key-block) grid step of online-softmax attention.

    The TPU grid is sequential with the key index innermost, so the VMEM
    scratch (running max / normalizer / accumulator) persists across the key
    sweep of a given query block and the output is written once at the end.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # keep q/k/v in their native dtype into the MXU (bf16 inputs run the
    # bf16 systolic path) and accumulate f32 via preferred_element_type;
    # upcasting to f32 first would forfeit ~8x bf16 MXU throughput.
    q = q_ref[0]                                      # (bq, d)
    k = k_ref[0]                                      # (bk, d)
    v = v_ref[0]                                      # (bk, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_scr[...] = m_new
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = (acc_scr[...] * alpha
                    + jnp.dot(p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32))

    @pl.when(ki == n_k - 1)
    def _finish():
        o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def flash_attention(q, k, v, scale: float | None = None,
                    block_q: int | None = None,
                    block_k: int | None = None,
                    interpret: bool = False):
    """(BH, T, d) non-causal attention with O(block) VMEM.

    Requires T % block sizes == 0 (spatial token counts 64/256/1024/4096 all
    qualify); use ``attention`` for automatic fallback. Block sizes default
    to ``auto_blocks`` (measured policy).
    """
    BH, T, d = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    abq, abk = auto_blocks(T, d)
    block_q = min(block_q or abq, T)
    block_k = min(block_k or abk, T)
    if T % block_q or T % block_k:
        # the grid would TRUNCATE: tail query rows stay uninitialized and
        # every row misses the tail keys — forced-flash callers bypass the
        # dispatch's divisibility check, so fail loudly here
        raise ValueError(
            f"flash_attention: T={T} must divide block sizes "
            f"({block_q}, {block_k}) — use `attention` for auto fallback")
    n_k = T // block_k
    kernel = functools.partial(_flash_kernel, scale=scale, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=(BH, T // block_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# -- tensor-parallel (head-sharded) attention ---------------------------------
#
# GSPMD cannot auto-partition a pallas_call, so under the diffusion TP rules
# (parallel/sharding.py) the model-parallel path used to force einsum
# attention. Heads ARE the model-parallel unit though (to_q/to_k/to_v are
# column-parallel), so attention is embarrassingly parallel over the leading
# (batch*heads) axis: a shard_map over the mesh's model axis runs the flash
# kernel per-device on its local head shard with NO collectives inside.
#
# ``head_sharded_attention`` is a TRACE-TIME switch: keep the context active
# around every call (or retrace) of the jitted program that should partition
# attention this way. Inside the shard_map each shard re-enters the normal
# dispatch, so flash runs exactly where it measurably pays and einsum
# otherwise (and the CPU test mesh exercises the identical program).

_TP_CTX: list = []


class head_sharded_attention:
    """Context manager: partition ``attention`` over mesh axis ``axis``.

    Self-attention whose head-batch divides the axis splits over HEADS
    (shard_map, per-device flash kernels, no collectives). When heads
    cannot split but the token axis can — the VAE's single-head 4096-token
    mid block — it falls back to sequence-parallel ring attention
    (``_ring_attention``: ppermute'd k/v blocks + online softmax).
    Everything else falls through to the plain GSPMD dispatch.

    ``force``: None (per-shard measured dispatch) | 'flash' |
    'flash_interpret' (Pallas interpret mode — CPU-mesh tests); applies to
    the head-sharded path.

    CACHE WARNING: the context is trace-time state and is NOT part of
    jit's cache key. A jitted callable first traced OUTSIDE the context
    (same function object, same avals) will cache-hit and silently skip
    the shard_map path when called inside it — use a fresh function
    object (e.g. a new lambda) per context state, or keep ALL calls of a
    given jitted program under the same context, as the serving CLI does.
    """

    def __init__(self, mesh, axis: str = "model", force: str | None = None):
        self.ctx = (mesh, axis, force)

    def __enter__(self):
        _TP_CTX.append(self.ctx)
        return self

    def __exit__(self, *exc):
        _TP_CTX.pop()
        return False


def _tp_attention(q, k, v, scale, mesh, axis, force, min_flash_len=4096):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local(q, k, v):
        if force in ("flash", "flash_interpret"):
            return flash_attention(q, k, v, scale,
                                   interpret=force == "flash_interpret")
        return _dispatch(q, k, v, scale, min_flash_len, force)

    spec = P(axis, None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_rep=False)(q, k, v)


# minimum PER-DEVICE token block for the ring: below this the ppermute
# latency dominates any compute win (4096 tokens over 8 devices = 512/dev)
RING_MIN_TOKENS = 256


def _ring_attention(q, k, v, scale, mesh, axis):
    """Sequence-parallel (ring) attention: q/k/v shard over TOKENS.

    For attention a head-split cannot touch — the SD VAE mid-block is
    single-head over 4096 tokens at 512px — the sequence axis is the only
    parallel dimension left. Each device holds one q/k/v token block;
    k/v blocks rotate around the ring with ``lax.ppermute`` (neighbor
    exchange — rides ICI) while the local q block folds every visiting
    k/v block into an online-softmax accumulator (same math as the flash
    kernel's key sweep, f32 accumulation). Non-causal, so visit order is
    irrelevant and no masking logic is needed. O(T/S) memory per device
    and S-1 permutes of the (B, T/S, d) k/v blocks.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    perm = [(j, (j + 1) % size) for j in range(size)]

    def local(q, k, v):
        B, Tl, d = q.shape

        def fold(m, l, acc, kb, vb):
            s = jnp.einsum("btd,bsd->bts", q, kb,
                           preferred_element_type=jnp.float32) * scale
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "bts,bsd->btd", p.astype(vb.dtype), vb,
                preferred_element_type=jnp.float32)
            return m_new, l, acc

        # fold the resident block first, then permute-then-fold (size-1)
        # times — exactly S-1 neighbor exchanges, none of them dead
        m, l, acc = fold(jnp.full((B, Tl, 1), -jnp.inf, jnp.float32),
                         jnp.zeros((B, Tl, 1), jnp.float32),
                         jnp.zeros((B, Tl, d), jnp.float32), k, v)

        def step(carry, _):
            m, l, acc, kb, vb = carry
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)
            m, l, acc = fold(m, l, acc, kb, vb)
            return (m, l, acc, kb, vb), ()

        (m, l, acc, _, _), _ = jax.lax.scan(step, (m, l, acc, k, v),
                                            None, length=size - 1)
        return (acc / l).astype(q.dtype)

    spec = P(None, axis, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_rep=False)(q, k, v)


def should_use_flash(shape, on_tpu: bool,
                     min_flash_len: int = 4096) -> bool:
    """Evidence-based dispatch policy (measured on v5e-1,
    tools/bench_attention.py, table + variance notes in PARITY.md):

      (8, 4096, 40): flash with auto (1024) blocks beats einsum 1.45x (f32)
          / 1.25x (bf16) — the 512px UNet down_0 hot spot, where XLA
          materializes the 4096^2 probability matrix;
      (8, 1024, 80) and (1, 4096, 512): inside the ~+-10% run-to-run noise
          of the tunneled dev chip — einsum stays (simpler, XLA-fused);
      serving batch (r3, tools/bench_unet_attn.py, BH=64): flash 1.91x at
          (64, 4096, 40), 1.12x at (64, 1024, 80), tie at 256 tokens and a
          0.9x LOSS at 64 tokens — so large-batch dispatch adds the
          1024-token level but nothing shorter.

    So flash where it measurably pays: T >= 4096 with head_dim <= 128, or
    T >= 1024 when the head-batch is serving-sized (BH >= 64). NB: the
    4096-token hd=40 attention is ~10% MFU under EITHER impl — a 40-wide
    contraction uses 40 of the MXU's 128 lanes; intrinsic to SD-v1's head
    shape, and the dominant term in the UNet's 40% step MFU
    (BASELINE.md roofline)."""
    BH, T, d = shape[0], shape[1], shape[2]
    bq, bk = auto_blocks(T, d)
    long_enough = T >= min_flash_len or (T >= 1024 and BH >= 64)
    return (on_tpu and long_enough
            and d <= 128 and T % bq == 0 and T % bk == 0)


def _dispatch(q, k, v, scale, min_flash_len, force):
    use_flash = (q.shape == k.shape and
                 (force == "flash" or
                  (force is None and
                   should_use_flash(q.shape, _on_tpu(), min_flash_len))))
    if use_flash:
        return flash_attention(q, k, v, scale)
    return reference_attention(q, k, v, scale)


def attention(q, k, v, scale: float | None = None,
              min_flash_len: int = 4096, force: str | None = None):
    """Dispatch: Pallas flash kernel on TPU where measured faster, einsum
    otherwise. q/k/v: (BH, T, d). ``force`` in {'flash','reference'} pins it;
    env SDVG_ATTN_FORCE does the same globally (experiments/benchmarks).

    Under an active ``head_sharded_attention`` context, self-attention whose
    head-batch divides the mesh's model axis is partitioned with shard_map
    (per-device flash kernels — the path GSPMD cannot derive on its own);
    everything else falls through to the plain dispatch, which GSPMD
    partitions fine."""
    if force is None:
        force = os.environ.get("SDVG_ATTN_FORCE") or None
    if _TP_CTX and force != "reference":
        mesh, axis, tp_force = _TP_CTX[-1]
        size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)
        if size > 1 and q.shape == k.shape:
            if q.shape[0] % size == 0:
                # an explicit caller force (argument or SDVG_ATTN_FORCE)
                # wins over the context's default per-shard dispatch
                return _tp_attention(q, k, v, scale, mesh, axis,
                                     tp_force or force, min_flash_len)
            if (q.shape[1] % size == 0 and
                    q.shape[1] // size >= RING_MIN_TOKENS):
                # heads cannot split (e.g. the VAE's single-head 4096-token
                # attention): shard the sequence instead. The gate is on
                # the PER-DEVICE block (T/size): below it the ppermute
                # latency dominates any compute win
                return _ring_attention(q, k, v, scale, mesh, axis)
    return _dispatch(q, k, v, scale, min_flash_len, force)
