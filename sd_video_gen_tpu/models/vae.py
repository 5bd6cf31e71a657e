"""Stable Diffusion v1.4 VAE (AutoencoderKL) natively in JAX/Flax, NHWC.

The reference consumes this model as a frozen black box from diffusers
(utils/sd_utils.py:52-54, encode at 128-145, decode at 156-169). Here the
architecture is implemented TPU-first:

  - NHWC layout throughout (TPU conv native layout; torch/diffusers is NCHW)
  - GroupNorm(32, eps=1e-6) + SiLU resnet blocks, single-head mid attention
  - asymmetric-pad stride-2 downsampling, nearest x2 upsampling —
    numerically identical to the torch ops given converted weights
  - bf16 compute / f32 params option; whole encode/decode jits into one
    XLA program (convs hit the MXU)

Weight conversion from HF-format checkpoints: diffusion/weights.py.
Architecture constants are SD-v1 AutoencoderKL defaults:
block_out_channels=(128,256,512,512), layers_per_block=2, latent_channels=4.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


def _gn(cfg, name):
    return nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)


def _conv(cfg, feats, kernel, name, strides=1, padding="SAME"):
    return nn.Conv(feats, (kernel, kernel), strides=(strides, strides),
                   padding=padding, dtype=cfg.dtype,
                   param_dtype=cfg.param_dtype, name=name)


class ResnetBlock(nn.Module):
    cfg: VAEConfig
    out_channels: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = _gn(c, "norm1")(x)
        h = nn.silu(h)
        h = _conv(c, self.out_channels, 3, "conv1")(h)
        h = _gn(c, "norm2")(h)
        h = nn.silu(h)
        h = _conv(c, self.out_channels, 3, "conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _conv(c, self.out_channels, 1, "conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over (H*W) tokens (VAE mid block)."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, H, W, C = x.shape
        h = _gn(c, "group_norm")(x).reshape(B, H * W, C)
        dense = lambda name: nn.Dense(C, dtype=c.dtype,
                                      param_dtype=c.param_dtype, name=name)
        q, k, v = dense("query")(h), dense("key")(h), dense("value")(h)
        # single-head over H*W tokens (4096 at 512px): Pallas flash kernel on
        # TPU (ops/attention dispatch), einsum fallback elsewhere.
        from sd_video_gen_tpu.ops.attention import attention
        h = attention(q, k, v, scale=C ** -0.5).astype(c.dtype)
        h = dense("proj_attn")(h).reshape(B, H, W, C)
        return x + h


class Downsample(nn.Module):
    cfg: VAEConfig
    channels: int

    @nn.compact
    def __call__(self, x):
        # torch pads (0,1,0,1): one row/col at bottom/right before stride-2.
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv(self.cfg, self.channels, 3, "conv", strides=2,
                     padding="VALID")(x)


class Upsample(nn.Module):
    cfg: VAEConfig
    channels: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return _conv(self.cfg, self.channels, 3, "conv")(x)


class MidBlock(nn.Module):
    cfg: VAEConfig
    channels: int

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.cfg, self.channels, name="resnet_0")(x)
        x = AttnBlock(self.cfg, name="attn")(x)
        x = ResnetBlock(self.cfg, self.channels, name="resnet_1")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ch = c.block_out_channels
        x = _conv(c, ch[0], 3, "conv_in")(x)
        for i, out_ch in enumerate(ch):
            for j in range(c.layers_per_block):
                x = ResnetBlock(c, out_ch, name=f"down_{i}_res_{j}")(x)
            if i < len(ch) - 1:
                x = Downsample(c, out_ch, name=f"down_{i}_downsample")(x)
        x = MidBlock(c, ch[-1], name="mid")(x)
        x = _gn(c, "norm_out")(x)
        x = nn.silu(x)
        return _conv(c, 2 * c.latent_channels, 3, "conv_out")(x)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        ch = list(reversed(c.block_out_channels))  # (512, 512, 256, 128)
        x = _conv(c, ch[0], 3, "conv_in")(z)
        x = MidBlock(c, ch[0], name="mid")(x)
        for i, out_ch in enumerate(ch):
            for j in range(c.layers_per_block + 1):
                x = ResnetBlock(c, out_ch, name=f"up_{i}_res_{j}")(x)
            if i < len(ch) - 1:
                x = Upsample(c, out_ch, name=f"up_{i}_upsample")(x)
        x = _gn(c, "norm_out")(x)
        x = nn.silu(x)
        return _conv(c, c.out_channels, 3, "conv_out")(x)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode(latents) -> pixels in [-1, 1]."""

    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        # 1x1 convs around the latent (diffusers quant_conv/post_quant_conv)
        self.quant_conv = _conv(self.cfg, 2 * self.cfg.latent_channels, 1,
                                "quant_conv")
        self.post_quant_conv = _conv(self.cfg, self.cfg.latent_channels, 1,
                                     "post_quant_conv")

    def encode(self, x):
        """NHWC pixels in [-1,1] -> (mean, logvar), each (B, H/8, W/8, 4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample: bool = False):
        mean, logvar = self.encode(x)
        if sample:
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        else:
            z = mean
        return self.decode(z), mean, logvar


def sample_latent(mean, logvar, rng):
    """Reparameterized draw from the diagonal gaussian posterior (the
    reference's latent_dists.sample(), utils/sd_utils.py:142)."""
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        rng, mean.shape, mean.dtype)
