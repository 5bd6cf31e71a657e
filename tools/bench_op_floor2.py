"""Disambiguate: is the ~150us floor per-OP (kernel launch) or per-scan-
iteration (harness artifact)?

Body with N chained NON-fusable matmuls: if time ~= N * 150us, the floor is
per-kernel; if ~= 150us + N * compute, it's the harness.
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
    return _timeit(name, fn, *args, rep=100)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4096, 320)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((320, 320)) * 0.05, jnp.bfloat16)

    def chain(n):
        def f(v, w):
            for _ in range(n):
                v = jnp.dot(v, w, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            return v
        return f

    t1 = timeit("dense_chain1", chain(1), x, w)
    t4 = timeit("dense_chain4", chain(4), x, w)
    t16 = timeit("dense_chain16", chain(16), x, w)
    print(json.dumps({"case": "marginal_us_per_extra_dense",
                      "c4": round((t4 - t1) / 3, 1),
                      "c16": round((t16 - t1) / 15, 1)}), flush=True)

    # mixed chain like a resnet block: GN-ish + silu + conv
    xc = jnp.asarray(rng.standard_normal((1, 64, 64, 320)), jnp.bfloat16)
    wc = jnp.asarray(rng.standard_normal((3, 3, 320, 320)) * 0.01, jnp.bfloat16)

    def convchain(n):
        def f(v, wc):
            for _ in range(n):
                v = jax.lax.conv_general_dilated(
                    v, wc, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return v
        return f

    c1 = timeit("conv_chain1", convchain(1), xc, wc)
    c4 = timeit("conv_chain4", convchain(4), xc, wc)
    print(json.dumps({"case": "marginal_us_per_extra_conv",
                      "c4": round((c4 - c1) / 3, 1)}), flush=True)


if __name__ == "__main__":
    main()
