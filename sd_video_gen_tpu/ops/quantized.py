"""Int8 weight/activation quantization for the AR serving path.

At serving batch sizes the frame-transformer rollout is MXU-bound (bench.py
knee measurements); the v5e MXU runs int8 at 2x its bf16 rate, so an
int8 x int8 path roughly doubles frames/sec beyond the bf16 ceiling.

Scheme (standard inference quantization):
  - weights: per-output-channel symmetric int8 (absmax / 127)
  - activations: dynamic per-token symmetric int8, computed in-graph
  - accumulation in int32 (preferred_element_type), rescale by the outer
    product of row and column scales in f32

``quantized_ar_apply`` mirrors FrameTransformer's 'ar' forward
(models/transformer.py) with every Dense as a quantized matmul; softmax /
layernorm / residual stay f32. Numerics are validated against the f32
forward in tests; rollout use is opt-in for serving.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from sd_video_gen_tpu.models.positional import sinusoidal_positions


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    values: jnp.ndarray  # int8 (in, out)
    scale: jnp.ndarray   # f32 (out,)

    def tree_flatten(self):
        return (self.values, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def quantize_weight(w: jnp.ndarray) -> QTensor:
    """(in, out) f32/bf16 -> per-out-channel symmetric int8."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(q, scale)


def qdense(x: jnp.ndarray, q: QTensor, bias=None) -> jnp.ndarray:
    """(..., in) @ int8 weights with dynamic per-token activation quant."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xi = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xi, q.values,
        dimension_numbers=(((xi.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * q.scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def _ln(x, p):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _q(p):  # quantize a Dense param dict
    return {"q": quantize_weight(p["kernel"]), "bias": p.get("bias")}


def quantize_frame_transformer(params: dict) -> dict:
    """FrameTransformer 'ar' params -> quantized param tree (Dense -> QTensor)."""
    p = params["params"]
    out = {"embedding": _q(p["embedding"]), "out": _q(p["out"]),
           "enc_norm": p["enc_norm"], "dec_norm": p["dec_norm"],
           "enc": [], "dec": []}

    def attn(a):
        d = {k: _q(a[k]) for k in a if k in ("qkv", "q", "k", "v", "out")}
        return d

    i = 0
    while f"enc_{i}" in p:
        e = p[f"enc_{i}"]
        out["enc"].append({
            "self_attn": attn(e["self_attn"]),
            "norm1": e["norm1"], "norm2": e["norm2"],
            "ffn": {"lin1": _q(e["ffn"]["lin1"]), "lin2": _q(e["ffn"]["lin2"])},
        })
        i += 1
    i = 0
    while f"dec_{i}" in p:
        d = p[f"dec_{i}"]
        out["dec"].append({
            "self_attn": attn(d["self_attn"]),
            "cross_attn": attn(d["cross_attn"]),
            "norm1": d["norm1"], "norm2": d["norm2"], "norm3": d["norm3"],
            "ffn": {"lin1": _q(d["ffn"]["lin1"]), "lin2": _q(d["ffn"]["lin2"])},
        })
        i += 1
    return out


def _mha(x_q, x_kv, a, num_heads, mask=None):
    if "qkv" in a:
        qkv = qdense(x_q, a["qkv"]["q"], a["qkv"]["bias"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = qdense(x_q, a["q"]["q"], a["q"]["bias"])
        k = qdense(x_kv, a["k"]["q"], a["k"]["bias"])
        v = qdense(x_kv, a["v"]["q"], a["v"]["bias"])
    B, Tq, D = q.shape
    Tk = k.shape[1]
    hd = D // num_heads
    q = q.reshape(B, Tq, num_heads, hd)
    k = k.reshape(B, Tk, num_heads, hd)
    v = v.reshape(B, Tk, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        logits = logits + mask
    w = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Tq, D)
    return qdense(o, a["out"]["q"], a["out"]["bias"])


@partial(jax.jit, static_argnames=("num_heads", "max_len", "pe_mode"))
def quantized_ar_apply(qp, src, tgt, tgt_mask=None, num_heads: int = 8,
                       max_len: int = 64, pe_mode: str = "timestep"):
    """Mirror of FrameTransformer mode='ar' forward with int8 matmuls.

    Implements the standard per-timestep positional encoding ONLY; a
    checkpoint served under pe_mode='reference_batch' (--reference_pe
    compat) must use the f32 path — the predict CLI enforces this at the
    flag level, and library callers hit the assert below instead of a
    silently different forward."""
    assert pe_mode == "timestep", \
        "quantized_ar_apply implements pe_mode='timestep' only"
    D = qp["embedding"]["q"].values.shape[1]
    scale = math.sqrt(D)
    pos = sinusoidal_positions(max_len, D)
    src = qdense(src, qp["embedding"]["q"], qp["embedding"]["bias"]) * scale
    tgt = qdense(tgt, qp["embedding"]["q"], qp["embedding"]["bias"]) * scale
    src = src + pos[None, : src.shape[1]]
    tgt = tgt + pos[None, : tgt.shape[1]]

    def ffn(x, f):
        h = jax.nn.relu(qdense(x, f["lin1"]["q"], f["lin1"]["bias"]))
        return qdense(h, f["lin2"]["q"], f["lin2"]["bias"])

    m = src
    for e in qp["enc"]:
        m = _ln(m + _mha(m, m, e["self_attn"], num_heads), e["norm1"])
        m = _ln(m + ffn(m, e["ffn"]), e["norm2"])
    m = _ln(m, qp["enc_norm"])  # final stack norm (torch encoder.norm)
    x = tgt
    for d in qp["dec"]:
        x = _ln(x + _mha(x, x, d["self_attn"], num_heads, tgt_mask), d["norm1"])
        x = _ln(x + _mha(x, m, d["cross_attn"], num_heads), d["norm2"])
        x = _ln(x + ffn(x, d["ffn"]), d["norm3"])
    x = _ln(x, qp["dec_norm"])  # final stack norm (torch decoder.norm)
    return qdense(x, qp["out"]["q"], qp["out"]["bias"])
