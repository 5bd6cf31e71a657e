"""Cross-stage pipelining experiment: can UNet and VAE work overlap?

VERDICT r4 #2. The denoise roofline (tools/roofline_denoise.py) shows
disjoint bottlenecks — UNet steps at 0.41 MFU (hd=40 attention underfills
the MXU's contraction lanes) while both VAE halves sit at the conv roof
(0.76-0.77) — which suggests interleaving stream i's UNet scan with stream
j's VAE encode/decode might recover part of the 56%-of-light attainment of
vae_denoise_ar4_8streams (reference round trip being replaced:
utils/sd_utils.py:222-267).

The physical question: a TPU v5e chip has ONE TensorCore executing one op
at a time — there is no SM-style concurrent-kernel execution — so any win
must come from XLA/runtime-level effects (DMA prefetch across op
boundaries, scheduling bubbles between dispatches, dispatch-queue idle
time). This tool measures exactly that, three ways:

  A. parts:   UNet 10-step tail alone; VAE round trip alone (B=8 each)
  B. fused:   ONE jitted program computing both on independent inputs —
              XLA free to interleave at schedule level
  C. queued:  two separate jitted programs dispatched back-to-back with a
              single block at the end — runtime free to overlap dispatch

If B and C measure ~= A_unet + A_vae, cross-stage overlap is a measured
negative on this hardware and the 9.9 f/s DDIM point is schedule-optimal
(the remaining gap to ~17 f/s is the UNet's intrinsic hd=40 MFU, already
measured intrinsic by tools/bench_headpack_probe.py).

Usage: python tools/bench_cross_stage.py [--batch 8] [--rep 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from sd_video_gen_tpu.utils.backend import init_backend_or_die  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="streams per stage (north-star saturation point)")
    ap.add_argument("--rep", type=int, default=6)
    ap.add_argument("--start_step", type=int, default=40,
                    help="DDIM start step (40 -> 10-step tail)")
    args = ap.parse_args()

    init_backend_or_die(tool="bench_cross_stage")

    import numpy as np
    import jax
    import jax.numpy as jnp
    from sd_video_gen_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from sd_video_gen_tpu.diffusion.sd import SDPipeline
    from sd_video_gen_tpu.models.vae import AutoencoderKL
    from tools._bench_harness import measure

    B = args.batch
    LO = 64
    pipe = SDPipeline(frame_size=512, dtype=jnp.bfloat16)
    bf16 = lambda t: jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, t)
    up, vp = bf16(pipe.unet_params), bf16(pipe.vae.params)
    emb = jnp.concatenate(
        [jnp.repeat(pipe.uncond_embeddings(1)[:1], B, 0)] * 2, 0)

    rng = np.random.default_rng(0)
    z_hi = jnp.asarray(rng.standard_normal((B, 64, 64, 4)) * 0.2,
                       jnp.bfloat16)           # 512px latent entering the UNet
    img_hi = jnp.asarray(rng.standard_normal((B, 512, 512, 3)) * 0.2,
                         jnp.bfloat16)         # 512px pixels entering the VAE

    def unet_tail(z, up, emb):
        """The 10-step DDIM scan of one refine call (diffusion/refine.py)."""
        return pipe.i2i_scan(up, z, emb, guidance_scale=0.0,
                             start_step=args.start_step,
                             num_inference_steps=50,
                             noise_rng=jax.random.PRNGKey(0))

    def vae_round(img, vp):
        """Both VAE halves of one refine call: encode@512 + decode@512
        (the lo-res legs are ~50x smaller — negligible)."""
        lat = pipe.vae.model.apply(vp, img, method=AutoencoderKL.encode)[0]
        return pipe.vae.model.apply(vp, lat, method=AutoencoderKL.decode)

    def fused(z_img, up, vp, emb):
        """One program, both stages, independent inputs: XLA may interleave.
        Inputs packed in one tuple so measure() perturbs both per iteration."""
        z, img = z_img
        return unet_tail(z, up, emb), vae_round(img, vp)

    t_unet = measure(unet_tail, z_hi, up, emb, rep=args.rep)
    t_vae = measure(vae_round, img_hi, vp, rep=args.rep)
    print(json.dumps({"case": "parts", "unet_tail_ms": round(t_unet * 1e3, 2),
                      "vae_round_ms": round(t_vae * 1e3, 2),
                      "serial_sum_ms": round((t_unet + t_vae) * 1e3, 2)}),
          flush=True)

    t_fused = measure(fused, (z_hi, img_hi), up, vp, emb, rep=args.rep)
    print(json.dumps({"case": "fused_one_program",
                      "ms": round(t_fused * 1e3, 2),
                      "vs_serial": round(t_fused / (t_unet + t_vae), 3)}),
          flush=True)

    # C: two independent programs, async dispatch, one block at the end.
    j_unet = jax.jit(unet_tail)
    j_vae = jax.jit(vae_round)
    j_unet(z_hi, up, emb).block_until_ready()       # compile
    j_vae(img_hi, vp).block_until_ready()
    best = float("inf")
    for _ in range(3):
        outs = []
        t0 = time.perf_counter()
        for i in range(args.rep):
            zi = z_hi + (i % 3) * 1e-3
            ii = img_hi + (i % 3) * 1e-3
            outs.append(j_unet(zi, up, emb))        # queue stage 1
            outs.append(j_vae(ii, vp))              # queue stage 2, no sync
        for o in outs:
            o.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / args.rep)
    print(json.dumps({"case": "async_two_queues",
                      "ms": round(best * 1e3, 2),
                      "vs_serial": round(best / (t_unet + t_vae), 3)}),
          flush=True)

    verdict = "overlap" if min(t_fused, best) < 0.95 * (t_unet + t_vae) \
        else "no_overlap"
    # frames/s bound for the full pipeline if this overlap factor applied
    # to the whole per-frame budget (10 UNet steps + VAE round trip)
    print(json.dumps({
        "verdict": verdict,
        "overlap_factor": round(min(t_fused, best) / (t_unet + t_vae), 3),
        "note": "TPU v5e = one TensorCore; <1.0 means XLA/runtime found "
                "schedule-level overlap, ~1.0 means the 8-stream DDIM "
                "point is schedule-optimal and the gap to light is the "
                "UNet's intrinsic hd=40 MFU"}), flush=True)


if __name__ == "__main__":
    main()
