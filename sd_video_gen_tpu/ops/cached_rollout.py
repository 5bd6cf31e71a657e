"""KV-cached incremental AR rollout — the opt-in serving fast path.

The reference (and ``ops/rollout.ar_rollout``, the numerics reference) re-runs
the ENTIRE encoder+decoder on the window for every predicted frame
(prediction/predict.py:16-42): O(P·T²) layer work. This module runs the
classic seq2seq incremental decode instead:

  - the encoder runs ONCE on [SOS + context] and its memory (and each
    decoder layer's cross-attention K/V of it) is frozen;
  - the decoder prefills over the context with the causal mask, recording
    each layer's self-attention K/V;
  - each new frame is ONE decoder step: fused-QKV of a single token,
    K/V appended into preallocated caches (lax.scan carry,
    dynamic_update_slice), attention over the valid prefix.

O(P·T) instead of O(P·T²), and only `num_decoder_layers` of the stack run
per step.

Numerics contract: the FIRST predicted frame is mathematically identical to
``ar_rollout`` (same src, same tgt, same causal math — tested to f32
tolerance). From the second frame on the schemes differ by construction:
the reference feeds predictions back through the (bidirectional) encoder,
which cannot be cached exactly; this path conditions the frozen context
memory and grows only the decoder sequence (see PARITY.md). Use it for
serving throughput, not for reference-parity evaluation.

All pure functions over the FrameTransformer param tree (mode='ar'); the
module classes are not re-entered, so the whole rollout is one lax.scan.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from sd_video_gen_tpu.models.positional import sinusoidal_positions
from sd_video_gen_tpu.ops.masks import causal_mask

_LN_EPS = 1e-5  # torch nn.Transformer default, as in models/transformer.py


def _dense(p, x, dtype):
    if "kernel" not in p:  # int8 serving tree (quantize_rollout_params)
        from sd_video_gen_tpu.ops.quantized import qdense
        return qdense(x, p["q"], p["bias"]).astype(dtype)
    return (x.astype(dtype) @ p["kernel"].astype(dtype)
            + p["bias"].astype(dtype))


def _ln(p, x):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    y = (x - mean) * jax.lax.rsqrt(var + _LN_EPS)
    return y * p["scale"] + p["bias"]


def _ffn(p, x, dtype):
    h = jax.nn.relu(_dense(p["lin1"], x, dtype))
    return _dense(p["lin2"], h, dtype)


def _heads(x, H):
    B, T, D = x.shape
    return x.reshape(B, T, H, D // H)


def _attend(q, k, v, mask, dtype):
    """q (B,Tq,H,hd), k/v (B,Tk,H,hd), additive mask broadcastable to
    (B,H,Tq,Tk) or None. Mirrors models/transformer.MultiHeadAttention."""
    hd = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    B, Tq = out.shape[:2]
    return out.reshape(B, Tq, -1).astype(dtype)


def _self_qkv(p, x, H, dtype):
    q, k, v = jnp.split(_dense(p["qkv"], x, dtype), 3, axis=-1)
    return _heads(q, H), _heads(k, H), _heads(v, H)


def _enc_layer(p, x, H, dtype):
    q, k, v = _self_qkv(p["self_attn"], x, H, dtype)
    a = _dense(p["self_attn"]["out"], _attend(q, k, v, None, dtype), dtype)
    x = _ln(p["norm1"], x + a)
    f = _ffn(p["ffn"], x, dtype)
    return _ln(p["norm2"], x + f)


def _dec_layer_prefill(p, x, mem_k, mem_v, mask, H, dtype):
    """Full causal decoder layer; returns (y, self-attn k, self-attn v)."""
    q, k, v = _self_qkv(p["self_attn"], x, H, dtype)
    a = _dense(p["self_attn"]["out"], _attend(q, k, v, mask, dtype), dtype)
    x = _ln(p["norm1"], x + a)
    cq = _heads(_dense(p["cross_attn"]["q"], x, dtype), H)
    ca = _dense(p["cross_attn"]["out"],
                _attend(cq, mem_k, mem_v, None, dtype), dtype)
    x = _ln(p["norm2"], x + ca)
    f = _ffn(p["ffn"], x, dtype)
    return _ln(p["norm3"], x + f), k, v


def _dec_layer_step(p, x, mem_k, mem_v, k_cache, v_cache, idx, H, dtype):
    """One-token decoder layer against the K/V caches; returns
    (y, updated k_cache, updated v_cache)."""
    q, k, v = _self_qkv(p["self_attn"], x, H, dtype)     # (B,1,H,hd)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype),
                                           (0, idx, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype),
                                           (0, idx, 0, 0))
    Tmax = k_cache.shape[1]
    valid = (jnp.arange(Tmax) <= idx)[None, None, None, :]
    mask = jnp.where(valid, 0.0, -jnp.inf)
    a = _dense(p["self_attn"]["out"],
               _attend(q, k_cache.astype(dtype), v_cache.astype(dtype),
                       mask, dtype), dtype)
    x = _ln(p["norm1"], x + a)
    cq = _heads(_dense(p["cross_attn"]["q"], x, dtype), H)
    ca = _dense(p["cross_attn"]["out"],
                _attend(cq, mem_k, mem_v, None, dtype), dtype)
    x = _ln(p["norm2"], x + ca)
    f = _ffn(p["ffn"], x, dtype)
    return _ln(p["norm3"], x + f), k_cache, v_cache


def cached_rollout(cfg, params, context: jnp.ndarray,
                   pred_frames: int, refine_fn=None) -> jnp.ndarray:
    """Frozen-memory incremental rollout.

    Args:
      cfg: FrameTransformerConfig (mode='ar').
      params: FrameTransformer variables ({'params': ...}).
      context: (B, T0, latent_dim) — [SOS + context frames], i.e. the same
        encode_batch output ar_rollout takes.
      pred_frames: number of latents to generate (static).
      refine_fn: optional (latents (B, L), step) -> (B, L) per-step hook
        (partial denoise), applied to each prediction before it feeds back —
        same contract as ops/rollout.ar_rollout.

    Returns (B, pred_frames, latent_dim) f32.
    """
    assert cfg.mode == "ar", "cached_rollout supports mode='ar'"
    # the cached path implements the standard per-timestep PE only; serving
    # a reference_batch-PE checkpoint through it would silently change the
    # trained forward (the predict CLI also guards this at the flag level)
    assert getattr(cfg, "pe_mode", "timestep") != "reference_batch", \
        "cached_rollout does not implement pe_mode='reference_batch' -- " \
        "use the full ar_rollout (--rollout full)"
    p = params["params"]
    H = cfg.num_heads
    D = cfg.model_width
    dtype = cfg.dtype
    scale = math.sqrt(D)
    B, T0, L = context.shape
    Tmax = T0 + pred_frames
    assert Tmax <= cfg.max_len, (
        f"rollout length {Tmax} exceeds positional table max_len={cfg.max_len}")
    pos = sinusoidal_positions(cfg.max_len, D).astype(dtype)

    def embed(x, t_start):
        e = _dense(p["embedding"], x, dtype) * scale
        T = e.shape[1]
        return e + pos[None, t_start:t_start + T]

    # -- encoder: once -------------------------------------------------------
    h = embed(context, 0)
    for i in range(cfg.num_encoder_layers):
        h = _enc_layer(p[f"enc_{i}"], h, H, dtype)
    memory = _ln(p["enc_norm"], h).astype(dtype)  # final stack norm

    # cross-attention K/V of the frozen memory: once per layer
    mems = []
    for i in range(cfg.num_decoder_layers):
        cp = p[f"dec_{i}"]["cross_attn"]
        mems.append((_heads(_dense(cp["k"], memory, dtype), H),
                     _heads(_dense(cp["v"], memory, dtype), H)))

    # -- decoder prefill over the context (causal), recording K/V -----------
    hd = D // H
    k_caches = [jnp.zeros((B, Tmax, H, hd), dtype) for _ in range(cfg.num_decoder_layers)]
    v_caches = [jnp.zeros((B, Tmax, H, hd), dtype) for _ in range(cfg.num_decoder_layers)]
    x = embed(context, 0)
    mask = causal_mask(T0)
    for i in range(cfg.num_decoder_layers):
        x, k, v = _dec_layer_prefill(p[f"dec_{i}"], x, *mems[i], mask, H, dtype)
        k_caches[i] = jax.lax.dynamic_update_slice(k_caches[i],
                                                   k.astype(dtype), (0, 0, 0, 0))
        v_caches[i] = jax.lax.dynamic_update_slice(v_caches[i],
                                                   v.astype(dtype), (0, 0, 0, 0))
    x = _ln(p["dec_norm"], x).astype(dtype)  # final stack norm
    first = _dense(p["out"], x[:, -1:], dtype).astype(jnp.float32)  # (B,1,L)
    if refine_fn is not None:
        first = refine_fn(first[:, 0], jnp.int32(0))[:, None]

    # -- incremental steps ---------------------------------------------------
    def step(carry, i):
        latent, k_caches, v_caches = carry
        # absolute position T0 - 1 + i for the token that predicts frame i+1
        x = _dense(p["embedding"], latent, dtype) * scale
        x = x + jax.lax.dynamic_slice_in_dim(pos, T0 - 1 + i, 1, axis=0)[None]
        new_k, new_v = [], []
        for l in range(cfg.num_decoder_layers):
            x, kc, vc = _dec_layer_step(p[f"dec_{l}"], x, *mems[l],
                                        k_caches[l], v_caches[l],
                                        T0 - 1 + i, H, dtype)
            new_k.append(kc)
            new_v.append(vc)
        x = _ln(p["dec_norm"], x).astype(dtype)  # final stack norm
        out = _dense(p["out"], x, dtype).astype(jnp.float32)  # (B,1,L)
        if refine_fn is not None:
            out = refine_fn(out[:, 0], i)[:, None]
        return (out, tuple(new_k), tuple(new_v)), out[:, 0]

    if pred_frames == 1:
        return first
    init = (first, tuple(k_caches), tuple(v_caches))
    # step i consumes prediction i (1-based frame i) at position T0-1+i
    _, rest = jax.lax.scan(step, init, jnp.arange(1, pred_frames))
    rest = jnp.moveaxis(rest, 0, 1)
    return jnp.concatenate([first, rest], axis=1)


def jit_cached_rollout(cfg, pred_frames: int):
    f = partial(cached_rollout, cfg, pred_frames=pred_frames)
    return jax.jit(lambda params, context: f(params, context))


def quantize_rollout_params(params: dict) -> dict:
    """FrameTransformer params -> int8 serving tree for ``cached_rollout``.

    Every Dense {kernel, bias} leaf-dict becomes {q: QTensor, bias}; norms
    and other params pass through. The single-token decode steps re-read the
    full weight set per frame and are weight-bandwidth bound — int8 halves
    the bytes vs bf16 on top of the 2x int8 MXU rate (ops/quantized.py).
    """
    from sd_video_gen_tpu.ops.quantized import quantize_weight

    def walk(node):
        if isinstance(node, dict):
            keys = set(node)
            if keys == {"kernel", "bias"} and getattr(node["kernel"], "ndim",
                                                      0) == 2:
                return {"q": quantize_weight(node["kernel"]),
                        "bias": node["bias"]}
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
