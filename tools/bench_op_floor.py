"""Probe the per-op cost floor on the TPU: does op time scale with FLOPs or
is there a fixed floor?

If a fixed ~150-250us floor dominates small-batch ops, the B=1 denoise
pipeline is OP-COUNT-bound, not FLOP-bound — the winning lever is fusing /
batching ops, not faster dtypes.
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

from tools._bench_harness import timeit as _timeit


def timeit(name, fn, *args, flops=None):
    return _timeit(name, fn, *args, rep=200, flops=flops)


def main():
    rng = np.random.default_rng(0)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)

    # dense scaling in M: fixed floor vs throughput
    w = jnp.asarray(rng.standard_normal((320, 320)), jnp.bfloat16)
    for M in (512, 4096, 32768, 131072):
        x = jnp.asarray(rng.standard_normal((M, 320)), jnp.bfloat16)
        timeit(f"dense_M{M}_320x320", dot, x, w, flops=2 * M * 320 * 320)

    # dense scaling in K/N at fixed M=4096
    for KN in (1280, 2560):
        x = jnp.asarray(rng.standard_normal((4096, KN)), jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((KN, KN)), jnp.bfloat16)
        timeit(f"dense_M4096_{KN}x{KN}", dot, x, w2,
               flops=2 * 4096 * KN * KN)

    # elementwise op floor
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 320)), jnp.bfloat16)
    timeit("silu_64x64x320", jax.nn.silu, x)
    timeit("chain8_silu", lambda v: jax.nn.silu(jax.nn.silu(jax.nn.silu(
        jax.nn.silu(jax.nn.silu(jax.nn.silu(jax.nn.silu(jax.nn.silu(v)))))))), x)

    # conv batch scaling (per-ITEM us)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 320, 320)), jnp.bfloat16)

    def conv(xx, ww):
        return jax.lax.conv_general_dilated(
            xx, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
    for B in (1, 8):
        xb = jnp.asarray(rng.standard_normal((B, 64, 64, 320)), jnp.bfloat16)
        us = timeit(f"conv_B{B}_64x64_320", conv, xb, w3,
                    flops=B * 2 * 64 * 64 * 9 * 320 * 320)
        print(json.dumps({"case": f"conv_B{B}_per_item_us",
                          "us": round(us / B, 1)}), flush=True)


if __name__ == "__main__":
    main()
