"""SD v1 UNet2DCondition natively in JAX/Flax, NHWC, bf16-capable.

The reference uses this as the frozen denoiser inside the partial-denoise
cleanup loop (utils/sd_utils.py:63-67 load; 97-126 and 222-267 inference).
TPU-first implementation notes:

  - NHWC everywhere; convs and attention matmuls land on the MXU
  - per-step timestep embedding computed in-graph, so a whole denoise
    schedule compiles into one lax.scan over steps
  - spatial self-attention operates on (H/8 * W/8) tokens — at 512px input
    that is 4096 tokens where fused attention matters (ops/attention.py
    provides the Pallas path; XLA einsum is the fallback)
  - weight conversion from HF checkpoints: diffusion/weights.convert_unet

Architecture constants = SD-v1.4 unet/config.json: block_out_channels
(320, 640, 1280, 1280), layers_per_block=2, 8 attention heads,
cross_attention_dim=768, norm_eps=1e-5 (UNet; the VAE uses 1e-6),
GEGLU feed-forward, down blocks [CrossAttn x3, Plain], up blocks mirrored.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.parallel.constrain import tp_constrain


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_heads: int = 8
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def down_has_attn(self, i: int) -> bool:
        return i < len(self.block_out_channels) - 1

    def up_has_attn(self, i: int) -> bool:
        return i > 0


def timestep_embedding(t: jnp.ndarray, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0, max_period: float = 10000.0):
    """Sinusoidal timestep features (diffusers get_timestep_embedding)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                           axis=-1)


def _gn(cfg, name, eps=None):
    return nn.GroupNorm(num_groups=cfg.norm_num_groups,
                        epsilon=eps if eps is not None else cfg.norm_eps,
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)


def _conv(cfg, feats, k, name, strides=1):
    return nn.Conv(feats, (k, k), strides=(strides, strides), padding="SAME"
                   if strides == 1 else ((1, 1), (1, 1)),
                   dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)


def _dense(cfg, feats, name, use_bias=True):
    return nn.Dense(feats, use_bias=use_bias, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name=name)


class TimeEmbedding(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, t_feat):
        c = self.cfg
        h = _dense(c, c.time_embed_dim, "linear_1")(t_feat)
        h = nn.silu(h)
        return _dense(c, c.time_embed_dim, "linear_2")(h)


class ResnetBlockT(nn.Module):
    """Resnet block with timestep-embedding injection."""

    cfg: UNetConfig
    out_channels: int

    @nn.compact
    def __call__(self, x, temb):
        c = self.cfg
        h = _gn(c, "norm1")(x)
        h = nn.silu(h)
        # Megatron pairing under TP: conv1 column-parallel -> activations
        # channel-sharded through GN/SiLU -> conv2 row-parallel (one
        # all-reduce back onto the replicated residual). The explicit
        # constraints stop GSPMD bouncing the time-emb broadcast through
        # replication (observed spmd_partitioner full-remat on up_*_res_*).
        h = tp_constrain(_conv(c, self.out_channels, 3, "conv1")(h), -1)
        t = tp_constrain(
            _dense(c, self.out_channels, "time_emb_proj")(nn.silu(temb)), -1)
        h = h + t[:, None, None, :]
        h = _gn(c, "norm2")(h)
        h = nn.silu(h)
        h = _conv(c, self.out_channels, 3, "conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _conv(c, self.out_channels, 1, "conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """Multi-head attention; context=None -> spatial self-attention."""

    cfg: UNetConfig
    query_dim: int
    context_dim: int | None = None

    @nn.compact
    def __call__(self, x, context=None):
        c = self.cfg
        H = c.attention_heads
        hd = self.query_dim // H
        ctx = x if context is None else context
        # Under TP, to_q/to_k/to_v are column-parallel (heads split over the
        # model axis) and to_out_0 is row-parallel. Constrain the projected
        # activations channel-sharded and the (B*H, T, hd) layout
        # head-sharded so GSPMD never replicates at the head-split reshapes
        # (observed spmd_partitioner full-remat on up_*_attn_*/attn2).
        q = tp_constrain(_dense(c, self.query_dim, "to_q", use_bias=False)(x),
                         -1)
        k = tp_constrain(
            _dense(c, self.query_dim, "to_k", use_bias=False)(ctx), -1)
        v = tp_constrain(
            _dense(c, self.query_dim, "to_v", use_bias=False)(ctx), -1)
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        # (B*H, T, hd) layout feeds ops/attention: Pallas flash kernel for the
        # long spatial self-attention (4096 tokens at 512px), einsum otherwise.
        from sd_video_gen_tpu.ops.attention import attention
        q = q.reshape(B, Tq, H, hd).transpose(0, 2, 1, 3).reshape(B * H, Tq, hd)
        k = k.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3).reshape(B * H, Tk, hd)
        v = v.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3).reshape(B * H, Tk, hd)
        q, k, v = (tp_constrain(a, 0) for a in (q, k, v))
        o = attention(q, k, v, scale=hd ** -0.5)
        o = tp_constrain(o, 0)
        o = o.reshape(B, H, Tq, hd).transpose(0, 2, 1, 3).reshape(
            B, Tq, self.query_dim).astype(c.dtype)
        return _dense(c, self.query_dim, "to_out_0")(tp_constrain(o, -1))


class FeedForwardGEGLU(nn.Module):
    cfg: UNetConfig
    dim: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        # diffusers fuses h|gate into one ff.net.0.proj matmul and chunks the
        # output. Two separate projections compute the identical function
        # (the converter splits the fused HF weight) but keep the halves
        # ALIGNED under tensor parallelism: with one fused kernel sharded
        # contiguously over `model`, each half lands on only half the
        # devices and GSPMD must fully rematerialize at the split (observed:
        # spmd_partitioner 'involuntary full rematerialization' per FF
        # block). Column-parallel h/gate + row-parallel out_proj is the
        # Megatron pairing with zero intra-FF collectives.
        h = tp_constrain(_dense(c, 4 * self.dim, "geglu_proj_h")(x), -1)
        gate = tp_constrain(_dense(c, 4 * self.dim, "geglu_proj_gate")(x), -1)
        h = h * nn.gelu(gate, approximate=False)
        return _dense(c, self.dim, "out_proj")(h)


class BasicTransformerBlock(nn.Module):
    cfg: UNetConfig
    dim: int

    @nn.compact
    def __call__(self, x, context):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=c.dtype,
                                       param_dtype=c.param_dtype, name=name)
        x = x + CrossAttention(c, self.dim, name="attn1")(ln("norm1")(x))
        x = x + CrossAttention(c, self.dim, c.cross_attention_dim,
                               name="attn2")(ln("norm2")(x), context)
        x = x + FeedForwardGEGLU(c, self.dim, name="ff")(ln("norm3")(x))
        return x


class Transformer2D(nn.Module):
    """GroupNorm -> 1x1 proj_in -> transformer block -> 1x1 proj_out + skip."""

    cfg: UNetConfig
    channels: int

    @nn.compact
    def __call__(self, x, context):
        c = self.cfg
        B, H, W, C = x.shape
        res = x
        h = _gn(c, "norm", eps=1e-6)(x)
        h = _conv(c, self.channels, 1, "proj_in")(h)
        h = h.reshape(B, H * W, C)
        h = BasicTransformerBlock(c, self.channels, name="block_0")(h, context)
        h = h.reshape(B, H, W, C)
        h = _conv(c, self.channels, 1, "proj_out")(h)
        return h + res


class Downsample2D(nn.Module):
    cfg: UNetConfig
    channels: int

    @nn.compact
    def __call__(self, x):
        return _conv(self.cfg, self.channels, 3, "conv", strides=2)(x)


class Upsample2D(nn.Module):
    cfg: UNetConfig
    channels: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return _conv(self.cfg, self.channels, 3, "conv")(x)


class UNet2DCondition(nn.Module):
    """sample (B, H, W, 4), timesteps (B,), context (B, 77, 768) -> eps."""

    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, sample, timesteps, context):
        c = self.cfg
        ch = c.block_out_channels
        n = len(ch)

        t_feat = timestep_embedding(timesteps, ch[0], c.flip_sin_to_cos,
                                    c.freq_shift)
        temb = TimeEmbedding(c, name="time_embedding")(t_feat.astype(c.dtype))

        x = _conv(c, ch[0], 3, "conv_in")(sample.astype(c.dtype))
        skips = [x]

        for i in range(n):
            for j in range(c.layers_per_block):
                x = ResnetBlockT(c, ch[i], name=f"down_{i}_res_{j}")(x, temb)
                if c.down_has_attn(i):
                    x = Transformer2D(c, ch[i], name=f"down_{i}_attn_{j}")(
                        x, context)
                skips.append(x)
            if i < n - 1:
                x = Downsample2D(c, ch[i], name=f"down_{i}_downsample")(x)
                skips.append(x)

        x = ResnetBlockT(c, ch[-1], name="mid_res_0")(x, temb)
        x = Transformer2D(c, ch[-1], name="mid_attn")(x, context)
        x = ResnetBlockT(c, ch[-1], name="mid_res_1")(x, temb)

        rev = list(reversed(ch))  # (1280, 1280, 640, 320)
        for i in range(n):
            for j in range(c.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlockT(c, rev[i], name=f"up_{i}_res_{j}")(x, temb)
                if c.up_has_attn(i):
                    x = Transformer2D(c, rev[i], name=f"up_{i}_attn_{j}")(
                        x, context)
            if i < n - 1:
                x = Upsample2D(c, rev[i], name=f"up_{i}_upsample")(x)

        x = _gn(c, "norm_out")(x)
        x = nn.silu(x)
        return _conv(c, c.out_channels, 3, "conv_out")(x).astype(jnp.float32)
