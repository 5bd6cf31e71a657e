"""Latent codecs: pixel-video <-> flattened frame-latent tokens.

The reference funnels every frame through the frozen SD-v1.4 VAE
(utils/sd_utils.py:128-169: /255 -> [-1,1] -> vae.encode().sample() * 0.18215;
decode is the inverse with clamp + uint8 round). Here that contract is a small
interface so the E2E pipeline also runs without SD weights:

  - ``PixelCodec``  — an invertible stand-in: bilinear-resize to the latent
    grid and pack 4 channels. CPU-runnable, no weights (BASELINE.json
    config #1: bouncing-ball without SD).
  - ``VAECodec``    — the real SD VAE in JAX (models/vae.py), same tensor
    contract, jitted on device.

Both produce/consume the flattened token layout the transformer uses:
(B, T, latent_dim) with latent_dim = 4*(H/8)*(W/8) and channel-major
reshape order (4, h, w) — matching utils/sd_utils.py:147-154 so losses
(GDL/NCE) see identical patch geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SD_LATENT_SCALE = 0.18215  # SD latent scaling (utils/sd_utils.py:143,159)
SOS_VALUE = 2.0            # SOS token = ones * 2 (utils/sd_utils.py:31)


def sos_token(latent_dim: int, batch: int) -> jnp.ndarray:
    return jnp.full((batch, 1, latent_dim), SOS_VALUE, dtype=jnp.float32)


def add_sos(latents: jnp.ndarray) -> jnp.ndarray:
    """Prepend the SOS token: (B, T, L) -> (B, T+1, L). encode_batch semantics
    (utils/sd_utils.py:147-154)."""
    return jnp.concatenate([sos_token(latents.shape[-1], latents.shape[0]),
                            latents], axis=1)


class PixelCodec:
    """Weight-free invertible codec on the SD latent grid.

    encode: BGR uint8 (…,H,W,3) -> [-1,1], bilinear resize to (H/8, W/8),
    channels [B,G,R,luma] -> flatten (4,h,w). decode inverts (drops luma).
    """

    def __init__(self, frame_size: int):
        self.frame_size = frame_size
        self.latent_hw = frame_size // 8
        self.latent_dim = 4 * self.latent_hw * self.latent_hw

    def encode_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, 3) uint8 -> (B, T, latent_dim) f32."""
        B, T, H, W, _ = frames.shape
        x = frames.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        x = x.reshape(B * T, H, W, 3)
        h = self.latent_hw
        x = jax.image.resize(x, (B * T, h, h, 3), method="bilinear")
        luma = jnp.mean(x, axis=-1, keepdims=True)
        x = jnp.concatenate([x, luma], axis=-1)          # (N, h, h, 4)
        x = x.transpose(0, 3, 1, 2)                      # channel-major like SD
        return x.reshape(B, T, self.latent_dim)

    def decode_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(N, latent_dim) f32 -> (N, H, W, 3) uint8 BGR."""
        N = latents.shape[0]
        h = self.latent_hw
        x = latents.reshape(N, 4, h, h).transpose(0, 2, 3, 1)[..., :3]
        x = jax.image.resize(x, (N, self.frame_size, self.frame_size, 3),
                             method="bilinear")
        x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
        return jnp.round(x * 255.0).astype(jnp.uint8)

    def encode_batch(self, frames: jnp.ndarray, use_sos: bool = True) -> jnp.ndarray:
        lat = self.encode_frames(frames)
        return add_sos(lat) if use_sos else lat


def make_codec(cfg, kind: str = "pixel", vae_params=None):
    """Factory: 'pixel' (no weights) or 'vae' (JAX SD VAE)."""
    if kind == "pixel":
        return PixelCodec(cfg.frame_size)
    if kind == "vae":
        from sd_video_gen_tpu.diffusion.vae_codec import VAECodec
        return VAECodec(cfg.frame_size, params=vae_params)
    raise ValueError(f"unknown codec kind: {kind}")
