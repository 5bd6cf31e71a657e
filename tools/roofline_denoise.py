"""Roofline for the denoise pipeline: measured ms vs XLA-counted FLOPs.

The r3 stream sweep (tools/bench_knee.py) shows per-chip denoise throughput
saturating at ~9.5 frames/s from B=8 on — the UNet went compute-bound. This
tool quantifies how close each piece runs to the v5e bf16 peak: FLOPs come
from the compiled executable's own cost analysis (no hand modeling), time
from the CSE-proof chained-scan harness.

Usage: python tools/roofline_denoise.py [batch ...]   (default 1 8 16)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from tools._bench_harness import (V5E_PEAK_BF16, flops_of, measure)


def main():
    batches = [int(b) for b in sys.argv[1:]] or [1, 8, 16]
    from sd_video_gen_tpu.diffusion.sd import SDPipeline
    from sd_video_gen_tpu.models.vae import AutoencoderKL

    pipe = SDPipeline(frame_size=512, dtype=jnp.bfloat16)
    up = jax.tree.map(lambda p: p.astype(jnp.bfloat16)
                      if p.dtype == jnp.float32 else p, pipe.unet_params)
    vp = jax.tree.map(lambda p: p.astype(jnp.bfloat16)
                      if p.dtype == jnp.float32 else p, pipe.vae.params)
    emb1 = pipe.uncond_embeddings(1)

    rng = np.random.default_rng(0)
    for B in batches:
        z = jnp.asarray(rng.standard_normal((B, 64, 64, 4)) * 0.2,
                        jnp.bfloat16)
        img = jnp.asarray(rng.standard_normal((B, 512, 512, 3)) * 0.2,
                          jnp.bfloat16)
        emb = jnp.concatenate([jnp.repeat(emb1[:1], B, 0)] * 2, 0)

        def unet_step(z, up, emb):
            return pipe._unet_eps(up, z, jnp.float32(301.0), emb, 0.0)

        def vae_dec(z, vp):
            return pipe.vae.model.apply(vp, z, method=AutoencoderKL.decode)

        def vae_enc(img, vp):
            return pipe.vae.model.apply(vp, img,
                                        method=AutoencoderKL.encode)[0]

        for name, fn, args in (("unet_step", unet_step, (z, up, emb)),
                               ("vae_decode512", vae_dec, (z, vp)),
                               ("vae_encode512", vae_enc, (img, vp))):
            fl = flops_of(fn, *args)
            dt = measure(fn, *args)
            print(json.dumps({
                "piece": name, "batch": B, "ms": round(dt * 1e3, 2),
                "ms_per_item": round(dt * 1e3 / B, 2),
                "gflops": round(fl / 1e9, 1),
                "mfu": round(fl / dt / V5E_PEAK_BF16, 3)}), flush=True)


if __name__ == "__main__":
    main()
