"""Is int8 a lever for the lane-starved hd=40 UNet attention?

The 512px UNet's 4096-token spatial self-attention has head_dim 40: the QK^T
contraction uses 40 of the MXU's 128 lanes, pinning the attention pieces near
~10% MFU under either impl (BASELINE.md roofline). v5e runs int8 matmuls at
2x the bf16 rate — IF that rate survives a 40-deep contraction, an int8 flash
kernel would halve the dominant term of the UNet's missing MFU.

Three questions, answered by raw einsum timings at the hot shape on chip:
  1. hd=40 vs hd=128 bf16 QK — equal times confirm the lane-padding bound
     (the 3.2x FLOP difference should vanish into padding).
  2. int8 vs bf16 at hd=40 for the QK-style dot ((BH,T,hd) x (BH,S,hd) ->
     (BH,T,S) s32/f32).
  3. int8 vs bf16 for the AV-style dot ((BH,T,S) x (BH,S,hd) -> (BH,T,hd)) —
     contraction dim 4096 (full lanes) but 40-wide output.

Usage: python tools/bench_attn_int8_probe.py
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

BH, T = 16, 4096
from tools._bench_harness import measure as _measure


def measure(fn, *args, rep=4):
    """Chained distinct-input invocations inside one jit; roll-
    perturbed so int8 inputs stay exact (tools/_bench_harness)."""
    return _measure(fn, *args, rep=rep, perturb='roll')


def qk_case(hd, dtype, acc_dtype):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        q = jnp.asarray(rng.integers(-127, 127, (BH, T, hd)), jnp.int8)
        k = jnp.asarray(rng.integers(-127, 127, (BH, T, hd)), jnp.int8)
    else:
        q = jnp.asarray(rng.standard_normal((BH, T, hd)) * 0.1, dtype)
        k = jnp.asarray(rng.standard_normal((BH, T, hd)) * 0.1, dtype)

    def dot(q, k):
        return jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=acc_dtype)

    dt = measure(dot, q, k)
    macs = BH * T * T * hd
    return {"case": f"qk_hd{hd}_{jnp.dtype(dtype).name}",
            "ms": round(dt * 1e3, 3),
            "tops": round(2 * macs / dt / 1e12, 1)}


def av_case(hd, dtype, acc_dtype):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        p = jnp.asarray(rng.integers(-127, 127, (BH, T, T)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (BH, T, hd)), jnp.int8)
    else:
        p = jnp.asarray(rng.standard_normal((BH, T, T)) * 0.01, dtype)
        v = jnp.asarray(rng.standard_normal((BH, T, hd)) * 0.1, dtype)

    def dot(p, v):
        return jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=acc_dtype)

    dt = measure(dot, p, v)
    macs = BH * T * T * hd
    return {"case": f"av_hd{hd}_{jnp.dtype(dtype).name}",
            "ms": round(dt * 1e3, 3),
            "tops": round(2 * macs / dt / 1e12, 1)}


def main():
    rows = [
        qk_case(40, jnp.bfloat16, jnp.float32),
        qk_case(128, jnp.bfloat16, jnp.float32),   # lane-padding control
        qk_case(40, jnp.int8, jnp.int32),
        av_case(40, jnp.bfloat16, jnp.float32),
        av_case(40, jnp.int8, jnp.int32),
    ]
    for r in rows:
        print(json.dumps(r), flush=True)
    by = {r["case"]: r["ms"] for r in rows}
    print(json.dumps({
        "lane_bound_confirmed_hd40_vs_128":
            round(by["qk_hd128_bfloat16"] / by["qk_hd40_bfloat16"], 2),
        "int8_speedup_qk": round(by["qk_hd40_bfloat16"] / by["qk_hd40_int8"], 2),
        "int8_speedup_av": round(by["av_hd40_bfloat16"] / by["av_hd40_int8"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
