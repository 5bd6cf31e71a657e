"""Head-packing probe: can hd=40 attention fill the MXU's 128 lanes?

The SD UNet's hottest attention is 8 heads x head_dim 40 at 4096 tokens
(reference utils/sd_utils.py:97-126 denoise loop; our models/unet.py). r3
measured that a bf16 QK einsum takes the SAME time at head_dim 40 and 128
(tools/bench_attn_int8_probe.py): the contraction dim is padded 40 -> 128,
so 69% of the MXU lanes carry zeros.

The obvious "fix" — pack 3 heads into a 120-lane contraction — is
algebraically unsound for EXACT attention:

  scores_h[i,j] = sum_d q_h[i,d] k_h[j,d]        (per-head, 40-dim)

  Packing q/k as concat_h along d gives sum_{h,d} q_h[i,d] k_h[j,d] —
  a CROSS-HEAD SUM that no later step can unmix (softmax is per-head).

  The sound block-diagonal variant — q rows zero-padded to their head's
  40-lane slot, (3T, 120) @ (120, T) — contracts over 120 lanes of which
  80 are STRUCTURAL ZEROS per row block. MXU passes:
      3 separate heads:   3 * T*T * pad(40->128)  = 384 T^2 MAC-lanes
      block-diag packed:  (3T)*T * pad(120->128)  = 384 T^2 MAC-lanes
  Identical. Lane padding is intrinsic to hd=40 exact attention; only a
  DIFFERENT model (hd >= 128) escapes it. The same argument covers the AV
  matmul (output lanes 40 -> 128: V_h can't share lanes because P_h
  differs per head).

This probe measures both formulations so the negative result is
evidence-backed, not just argued (VERDICT r3 #3). Run on the TPU chip:

  python tools/bench_headpack_probe.py          # full serving shape
  SDVG_PROBE_T=1024 python tools/...            # smaller T for CPU smoke
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from sd_video_gen_tpu.utils.backend import init_backend_or_die

init_backend_or_die("bench_headpack_probe")

import jax
import jax.numpy as jnp
import numpy as np

from tools._bench_harness import measure


def main():
    T = int(os.environ.get("SDVG_PROBE_T", 4096))
    B = int(os.environ.get("SDVG_PROBE_B", 8))   # batch of head-triples
    d = 40
    P = 3                                        # heads per 120-lane pack
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, P, T, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, P, T, d)), jnp.bfloat16)

    # (a) status quo: heads as a batch dim, contraction 40 (padded to 128)
    def qk_batched(q, k):
        return jnp.einsum("bhtd,bhsd->bhts", q, k,
                          preferred_element_type=q.dtype)

    # (b) block-diagonal pack: q rows land in their head's 40-lane slot of a
    # 120-lane contraction; k concatenates heads along d. One (3T,120)@(120,T)
    # matmul per pack yields the exact per-head scores (no cross terms:
    # q's zero blocks mask the other heads' k lanes).
    def qk_packed(q, k):
        b, p, t, hd = q.shape
        eye = jnp.eye(p, dtype=q.dtype)                       # (P, P)
        qz = jnp.einsum("bhtd,hg->bhtgd", q, eye)             # zero-pad slots
        qz = qz.reshape(b, p * t, p * hd)                     # (B, 3T, 120)
        kp = k.transpose(0, 2, 1, 3).reshape(b, t, p * hd)    # (B, T, 120)
        s = jnp.einsum("bxe,bse->bxs", qz, kp,
                       preferred_element_type=q.dtype)        # (B, 3T, T)
        return s.reshape(b, p, t, t)

    # exactness first (f32 check at small T so the probe can't drift wrong)
    qs, ks = q[:, :, :256].astype(jnp.float32), k[:, :, :256].astype(jnp.float32)
    ref = np.asarray(qk_batched(qs, ks).astype(jnp.float32))
    got = np.asarray(qk_packed(qs, ks).astype(jnp.float32))
    err = float(np.max(np.abs(ref - got)))
    assert err < 1e-3, f"packed formulation diverged: {err}"

    flops = 2 * B * P * T * T * d
    for name, fn in (("qk_batched_hd40", qk_batched),
                     ("qk_blockdiag_packed_120", qk_packed)):
        dt = measure(fn, q, k)
        print(json.dumps({"probe": name, "T": T, "ms": round(dt * 1e3, 2),
                          "useful_tflops": round(flops / dt / 1e12, 1)}),
              flush=True)
    print(json.dumps({"conclusion": "see module docstring — equal MXU "
                      "passes by construction; lane padding at hd=40 is "
                      "intrinsic to exact attention"}))


if __name__ == "__main__":
    main()
