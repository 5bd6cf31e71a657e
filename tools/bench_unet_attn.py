"""Where do the UNet's missing MFU points go at serving batch?

Roofline (tools/roofline_denoise.py): at B=8 the UNet step runs 40% MFU
while both VAE halves run ~76%. Two experiments on the real chip:

  1. whole UNet step at B=8 with attention forced to flash vs einsum
     (SDVG_ATTN_FORCE) — is the B=1-tuned dispatch policy still right?
  2. per-shape attention timings at serving batch (BH=64) for every
     spatial level of the 512px UNet.

Usage: python tools/bench_unet_attn.py [unet|shapes|all]
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

from tools._bench_harness import measure as _measure


def measure(fn, *args, rep=6):
    return _measure(fn, *args, rep=rep)


def bench_unet(B=8):
    from sd_video_gen_tpu.diffusion.sd import SDPipeline
    pipe = SDPipeline(frame_size=512, dtype=jnp.bfloat16)
    up = jax.tree.map(lambda p: p.astype(jnp.bfloat16)
                      if p.dtype == jnp.float32 else p, pipe.unet_params)
    emb1 = pipe.uncond_embeddings(1)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, 64, 64, 4)) * 0.2, jnp.bfloat16)
    emb = jnp.concatenate([jnp.repeat(emb1[:1], B, 0)] * 2, 0)

    def unet_step(z, up, emb):
        return pipe._unet_eps(up, z, jnp.float32(301.0), emb, 0.0)

    for mode in ("", "flash", "reference"):
        if mode:
            os.environ["SDVG_ATTN_FORCE"] = mode
        else:
            os.environ.pop("SDVG_ATTN_FORCE", None)
        dt = measure(unet_step, z, up, emb)
        print(json.dumps({"case": f"unet_b{B}_{mode or 'policy'}",
                          "ms": round(dt * 1e3, 2)}), flush=True)
    os.environ.pop("SDVG_ATTN_FORCE", None)


def bench_shapes(B=8):
    from sd_video_gen_tpu.ops.attention import attention
    rng = np.random.default_rng(0)
    # (BH, T, hd): self-attention at each 512px-UNet level, serving batch 8
    shapes = [(B * 8, 4096, 40), (B * 8, 1024, 80), (B * 8, 256, 160),
              (B * 8, 64, 160)]
    for s in shapes:
        q = jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
        hd = s[-1]
        row = {"shape": list(s)}
        for mode in ("flash", "reference"):
            try:
                dt = measure(lambda q, k, v: attention(q, k, v,
                                                       scale=hd ** -0.5,
                                                       force=mode), q, k, v)
                row[mode + "_ms"] = round(dt * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                row[mode + "_err"] = str(e)[:120]
        if "flash_ms" in row and "reference_ms" in row:
            row["flash_speedup"] = round(row["reference_ms"]
                                         / row["flash_ms"], 2)
        print(json.dumps(row), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "unet"):
        bench_unet()
    if which in ("all", "shapes"):
        bench_shapes()


if __name__ == "__main__":
    main()
