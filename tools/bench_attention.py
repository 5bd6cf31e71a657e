"""On-chip flash-attention validation + flash-vs-einsum timing.

VERDICT r1 item 8: the Pallas kernel needs (a) a non-interpret parity check
on real TPU at the 4096-token denoise shape, and (b) a measured delta vs
plain XLA einsum attention so the dispatch policy is evidence-based.

Shapes are the SD spatial-attention hot spots at 512px:
  (8, 4096, 40)  — UNet down_0 attn, batch 1, 8 heads of 40 (320 ch)
  (8, 1024, 80)  — UNet down_1 attn
  (1, 4096, 512) — VAE mid attn (single 512-dim head) — the shape whose
                   full-K/V VMEM blowup this kernel design fixed.

Timing chains REPEATS iterations in a lax.scan with a data dependence
(output feeds the next query) and syncs on a scalar, same methodology as
bench.py (tunnel RPC otherwise dominates). Prints one JSON line per
(shape, dtype, impl). Record results in PARITY.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from sd_video_gen_tpu.ops.attention import flash_attention, reference_attention

SHAPES = [(8, 4096, 40), (8, 1024, 80), (1, 4096, 512)]
REPEATS = 8


def run(impl, fn, shape, dtype):
    BH, T, d = shape
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), dtype)
               for _ in range(3))

    @jax.jit
    def timed(q, k, v):
        def body(q, _):
            o = fn(q, k, v)
            return o, jnp.sum(o.astype(jnp.float32))
        _, sums = jax.lax.scan(body, q, None, length=REPEATS)
        return jnp.sum(sums)

    _ = float(timed(q, k, v))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(timed(q, k, v))
        best = min(best, time.perf_counter() - t0)
    per_call_us = best / REPEATS * 1e6
    print(json.dumps({"impl": impl, "shape": list(shape),
                      "dtype": str(dtype.__name__),
                      "per_call_us": round(per_call_us, 1)}), flush=True)
    return per_call_us


def main():
    print(json.dumps({"backend": jax.default_backend()}))
    for shape in SHAPES:
        for dtype in (jnp.float32, jnp.bfloat16):
            # parity first (non-interpret, on-chip)
            rng = np.random.default_rng(1)
            q, k, v = (jnp.asarray(rng.standard_normal(shape), dtype)
                       for _ in range(3))
            err = float(jnp.max(jnp.abs(
                flash_attention(q, k, v).astype(jnp.float32)
                - reference_attention(q, k, v).astype(jnp.float32))))
            tol = 5e-2 if dtype == jnp.bfloat16 else 5e-3
            print(json.dumps({"parity_shape": list(shape),
                              "dtype": dtype.__name__,
                              "max_abs_err": round(err, 6),
                              "ok": err < tol}), flush=True)
            t_flash = run("flash", flash_attention, shape, dtype)
            t_ref = run("einsum", reference_attention, shape, dtype)
            print(json.dumps({"shape": list(shape), "dtype": dtype.__name__,
                              "flash_speedup": round(t_ref / t_flash, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
