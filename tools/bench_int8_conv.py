"""Measure int8 vs bf16 conv/dense at SD-UNet shapes on the TPU.

Decides the quantized-UNet design (ops/quantized_unet.py): if XLA lowers
s8xs8->s32 conv_general_dilated onto the MXU at 2x the bf16 rate, the UNet
gets full weight+activation int8; if not, fall back to weight-only int8
(bandwidth savings only).

CSE-proof methodology (NOTES_r2.md): scan over DISTINCT inputs chained by a
data dependence, sync via scalar fetch.
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


def timeit(name, fn, *args):
    return _timeit(name, fn, *args, rep=200)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x.dtype != jnp.int8 else jnp.int32)


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("l0_64x64_320", (1, 64, 64, 320), (3, 3, 320, 320)),
        ("l2_16x16_1280", (1, 16, 16, 1280), (3, 3, 1280, 1280)),
    ]
    for name, xs, ws in shapes:
        x = rng.standard_normal(xs).astype(np.float32)
        w = rng.standard_normal(ws).astype(np.float32)
        t_bf16 = timeit(f"{name}_bf16", conv, jnp.asarray(x, jnp.bfloat16),
                        jnp.asarray(w, jnp.bfloat16))
        xi = jnp.asarray(np.clip(np.round(x * 10), -127, 127), jnp.int8)
        wi = jnp.asarray(np.clip(np.round(w * 10), -127, 127), jnp.int8)
        try:
            t_int8 = timeit(f"{name}_int8", conv, xi, wi)
            print(json.dumps({"case": f"{name}_speedup",
                              "int8_vs_bf16": round(t_bf16 / t_int8, 2)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": f"{name}_int8", "error": str(e)[:200]}),
                  flush=True)
        # weight-only: dequant int8->bf16 in-graph then bf16 conv
        sc = jnp.float32(0.1)

        def wonly(x, wi, sc):
            return conv(x, (wi.astype(jnp.bfloat16) * sc.astype(jnp.bfloat16)))
        timeit(f"{name}_int8weightonly", wonly,
               jnp.asarray(x, jnp.bfloat16), wi, sc)

    # dense at the UNet attention projection shape
    x = rng.standard_normal((4096, 320)).astype(np.float32)
    w = rng.standard_normal((320, 320)).astype(np.float32)
    t_bf16 = timeit("dense_4096x320_bf16",
                    lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
                    jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16))
    xi = jnp.asarray(np.clip(np.round(x * 10), -127, 127), jnp.int8)
    wi = jnp.asarray(np.clip(np.round(w * 10), -127, 127), jnp.int8)
    t_int8 = timeit("dense_4096x320_int8",
                    lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32),
                    xi, wi)
    print(json.dumps({"case": "dense_speedup",
                      "int8_vs_bf16": round(t_bf16 / t_int8, 2)}), flush=True)


if __name__ == "__main__":
    main()
