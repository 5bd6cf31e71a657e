"""SD-VAE latent codec: the reference's SDUtils encode/decode contract on TPU.

Semantics match utils/sd_utils.py exactly:
  encode (128-145): uint8/255 -> [-1,1] -> vae.encode -> latent * 0.18215
  decode (156-169): latent / 0.18215 -> vae.decode -> ((x/2)+0.5).clip(0,1)
                    -> *255 -> round -> uint8
  encode_batch (147-154): flatten (4,h,w) channel-major per frame, prepend
                          the SOS token (ones*2).

Deviation (documented): the reference draws a stochastic posterior sample per
encode (``latent_dists.sample()``); default here is the posterior mean
(deterministic, standard for frozen-encoder pipelines). Pass ``rng`` to
reproduce sampling behavior.

The codec holds converted HF weights (diffusion/weights.convert_vae); without
weights it can run random-init (shape-correct, for tests/benches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sd_video_gen_tpu.codecs import SD_LATENT_SCALE, add_sos
from sd_video_gen_tpu.models.vae import AutoencoderKL, VAEConfig, sample_latent


class VAECodec:
    def __init__(self, frame_size: int, params=None, cfg: VAEConfig | None = None,
                 dtype=None):
        import dataclasses
        if cfg is None:
            self.cfg = VAEConfig(dtype=dtype or jnp.float32)
        elif dtype is not None and dtype != cfg.dtype:
            # an EXPLICIT dtype override must compose with a custom cfg —
            # silently ignoring it ran the VAE at the wrong precision
            # (dtype=None means: keep the cfg's dtype)
            self.cfg = dataclasses.replace(cfg, dtype=dtype)
        else:
            self.cfg = cfg
        self.frame_size = frame_size
        # spatial compression = 2^(n_blocks - 1): 8x for the 4-block SD VAE
        factor = 2 ** (len(self.cfg.block_out_channels) - 1)
        self.latent_hw = frame_size // factor
        self.latent_dim = (self.cfg.latent_channels
                           * self.latent_hw * self.latent_hw)
        self.model = AutoencoderKL(self.cfg)
        if params is None:
            # random init (no SD weights available): shape-correct stand-in.
            # The VAE is fully convolutional, so init at a small spatial size
            # regardless of frame_size (a 512px init forward costs minutes on
            # a slow host for identical params).
            dummy = min(frame_size, 8 * factor)
            x = jnp.zeros((1, dummy, dummy, 3), jnp.float32)
            # jit: one dispatch instead of per-op round trips (the dev TPU
            # tunnel has ~50ms RPC latency; eager init costs minutes)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(0), x)
        self.params = params

    @classmethod
    def from_checkpoint(cls, frame_size: int, path: str, **kw) -> "VAECodec":
        from sd_video_gen_tpu.diffusion.weights import load_state_dict, convert_vae
        return cls(frame_size, params=convert_vae(load_state_dict(path)), **kw)

    # -- pixel <-> latent ----------------------------------------------------
    # ``params`` overrides support threading weights through an outer jit
    # boundary (see diffusion/refine.py) instead of closing over self.params.
    def encode_frames(self, frames: jnp.ndarray, rng=None,
                      params=None) -> jnp.ndarray:
        """(B, T, H, W, 3) uint8 BGR -> (B, T, latent_dim) f32."""
        B, T, H, W, _ = frames.shape
        x = frames.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        x = x.reshape(B * T, H, W, 3)
        mean, logvar = self.model.apply(params or self.params, x,
                                        method=AutoencoderKL.encode)
        z = sample_latent(mean, logvar, rng) if rng is not None else mean
        z = z.astype(jnp.float32) * SD_LATENT_SCALE
        z = z.transpose(0, 3, 1, 2)  # channel-major flatten (sd_utils:149)
        return z.reshape(B, T, self.latent_dim)

    def decode_latents(self, latents: jnp.ndarray, params=None) -> jnp.ndarray:
        """(N, latent_dim) f32 -> (N, H, W, 3) uint8 BGR."""
        N = latents.shape[0]
        h = self.latent_hw
        z = latents.reshape(N, self.cfg.latent_channels, h, h)
        z = z.transpose(0, 2, 3, 1) / SD_LATENT_SCALE
        x = self.model.apply(params or self.params, z,
                             method=AutoencoderKL.decode)
        x = jnp.clip(x.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
        return jnp.round(x * 255.0).astype(jnp.uint8)

    def encode_batch(self, frames: jnp.ndarray, use_sos: bool = True,
                     rng=None, params=None) -> jnp.ndarray:
        lat = self.encode_frames(frames, rng=rng, params=params)
        return add_sos(lat) if use_sos else lat
