"""Per-frame partial-denoise refinement for AR rollout (--denoise path).

Reference: prediction/predict.py:145-186 — for every predicted latent:
decode -> upscale to 512 -> re-encode -> DDIM add_noise at
timesteps[start_step] -> denoise the remaining (50 - start_step) steps with
guidance_scale=0 (uncond text only) -> decode -> downscale -> re-encode.
The reference bounced through host numpy >=6 times per frame; here the whole
round trip is a pure function the rollout lax.scan fuses into its step body
— zero host transfers.

Resizes use nearest-neighbor on uint8 pixels, matching the reference's
default F.interpolate mode. Noise is drawn from a fixed fold-in key per call
site (the reference used unseeded torch.randn; ours is reproducible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sd_video_gen_tpu.diffusion.sd import SDPipeline


def make_denoise_refiner(cfg, start_step: int, pipeline: SDPipeline | None = None,
                         num_inference_steps: int = 50, hi_res: int = 512):
    """Build a (B, latent_dim) -> (B, latent_dim) refine hook for ar_rollout.

    ``cfg``: framework Config (frame_size, latent layout). ``pipeline``:
    SDPipeline holding VAE/UNet/CLIP params (random-init fallback otherwise).
    """
    pipe = pipeline or SDPipeline(frame_size=hi_res)
    lo = cfg.frame_size
    h_lo = lo // 8

    # VAE codec views at both resolutions share one param tree.
    from sd_video_gen_tpu.diffusion.vae_codec import VAECodec
    vae_lo = VAECodec(lo, params=pipe.vae.params, cfg=pipe.vae.cfg)
    vae_hi = pipe.vae if pipe.frame_size == hi_res else VAECodec(
        hi_res, params=pipe.vae.params, cfg=pipe.vae.cfg)

    def refine(flat_latents: jnp.ndarray) -> jnp.ndarray:
        B = flat_latents.shape[0]
        # decode predicted latent at native resolution
        img_lo = vae_lo.decode_latents(flat_latents)            # (B, lo, lo, 3)
        # upscale pixels to the SD-native 512
        img_hi = jax.image.resize(img_lo, (B, hi_res, hi_res, 3),
                                  method="nearest")
        lat_hi = pipe.encode_img(img_hi)                        # (B, 64, 64, 4)
        emb = pipe.uncond_embeddings(B)
        den = pipe.gen_i2i_latents(emb, height=hi_res, width=hi_res,
                                   num_inference_steps=num_inference_steps,
                                   guidance_scale=0.0, latents=lat_hi,
                                   start_step=start_step,
                                   rng=jax.random.PRNGKey(start_step))
        img_den = pipe._decode_pixels(den)                      # (B, 512, 512, 3)
        img_back = jax.image.resize(img_den, (B, lo, lo, 3), method="nearest")
        lat_back = vae_lo.encode_frames(img_back[:, None])      # (B, 1, L)
        return lat_back[:, 0]

    return refine
