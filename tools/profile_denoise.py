"""Time the vae_denoise pipeline's pieces on TPU (B=1, 64px->512px refine).

Per predicted frame the refine hook runs: VAE decode@64 -> resize -> VAE
encode@512 -> 10 UNet steps @512 -> VAE decode@512 -> resize -> VAE
encode@64. Prints per-piece ms so optimization targets the real hot spot.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from sd_video_gen_tpu.config import Config
from sd_video_gen_tpu.diffusion.sd import SDPipeline
from sd_video_gen_tpu.diffusion.vae_codec import VAECodec
from tools._bench_harness import measure


def timeit(name, fn, x, *rest):
    """CSE-proof per-piece time via the shared harness (identical repeated
    calls get CSE'd by XLA into one execution — every piece once looked
    8x faster than reality)."""
    dt = measure(fn, x, *rest, rep=8)
    print(json.dumps({"piece": name, "ms": round(dt * 1e3, 2)}), flush=True)


def main():
    pipe = SDPipeline(frame_size=512, dtype=jnp.bfloat16)
    bf16 = lambda t: jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, t)
    vp = bf16(pipe.vae.params)
    up = bf16(pipe.unet_params)
    uncond = pipe.uncond_embeddings(1)
    vae512 = VAECodec(512, params=pipe.vae.params, cfg=pipe.vae.cfg)
    vae64 = VAECodec(64, params=pipe.vae.params, cfg=pipe.vae.cfg)

    rng = np.random.default_rng(0)
    lat64 = jnp.asarray(rng.standard_normal((1, vae64.latent_dim)), jnp.float32)
    img512 = jnp.asarray(rng.integers(0, 255, (1, 512, 512, 3)), jnp.uint8)
    z512 = jnp.asarray(rng.standard_normal((1, 64, 64, 4)), jnp.float32)
    emb = jnp.concatenate([uncond[:1]] * 2, 0)

    timeit("vae_decode_64", lambda z, p: vae64.decode_latents(z, params=p),
           lat64, vp)
    timeit("vae_encode_512",
           lambda im, p: vae512.encode_frames(im[:, None], params=p),
           img512, vp)
    timeit("vae_decode_512",
           lambda z, p: vae512.decode_latents(
               z.reshape(1, -1), params=p),
           jnp.asarray(rng.standard_normal((1, 4, 64, 64)), jnp.float32), vp)
    timeit("unet_1step",
           lambda z, u, e: pipe._unet_eps(u, z, jnp.int32(601), e, 0.0),
           z512, up, emb)
    timeit("unet_10step_scan",
           lambda z, u, e: pipe.i2i_scan(u, z, e, guidance_scale=0.0,
                                         start_step=40,
                                         num_inference_steps=50,
                                         noise_rng=jax.random.PRNGKey(0)),
           z512, up, emb)


if __name__ == "__main__":
    main()
