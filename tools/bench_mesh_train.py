"""Training-step mesh scaling smoke: DP and DPxTP over 1/2/4/8 virtual CPU
devices (companion to tools/bench_mesh.py, which covers the rollout).

Checks, per device count: the FULL train step (uint8 -> encode -> fwd/bwd ->
psum'd grads -> Adam) compiles and runs under the mesh, the batch axis is
partitioned, and the loss trajectory matches the single-device run (f32
reduction-order tolerance) — a wrong gradient psum would diverge immediately.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MAX_DEV = 8
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           f" --xla_force_host_platform_device_count={MAX_DEV}")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

GLOBAL_BATCH = 8
STEPS = 4


def run(n: int, tp: bool):
    from sd_video_gen_tpu.config import Config
    from sd_video_gen_tpu.codecs import PixelCodec
    from sd_video_gen_tpu.ops import LossWeights
    from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
    from sd_video_gen_tpu.train.trainer import make_train_step
    from sd_video_gen_tpu.parallel import (make_mesh, param_shardings,
                                           batch_sharding)

    t = 2 if (tp and n >= 2) else 1
    mesh = make_mesh(f"data={n // t},model={t}", devices=jax.devices()[:n])
    cfg = Config(config_name="meshtrain", lr=1e-3, batch_size=GLOBAL_BATCH,
                 frames_per_clip=3, frames_to_predict=2, frame_size=32,
                 dim_model=64, num_heads=4, num_encoder_layers=1,
                 num_decoder_layers=1, dropout_p=0.0, use_mse=True,
                 use_gdl=True, use_contrastive=True, lambda_contrastive=0.025)
    codec = PixelCodec(cfg.frame_size)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=64,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0,
                                dim_feedforward=128)
    model = FrameTransformer(mc)
    init_fn, step_fn = make_train_step(model, codec,
                                       LossWeights.from_config(cfg), cfg)
    frames = np.random.default_rng(0).integers(
        0, 255, (GLOBAL_BATCH, 5, 32, 32, 3)).astype(np.uint8)
    batch = jnp.asarray(frames)
    state = jax.jit(init_fn)(jax.random.PRNGKey(0), batch)
    state = jax.device_put(state, param_shardings(mesh, state))
    batch = jax.device_put(batch, batch_sharding(mesh))

    losses = []
    t0 = None
    for i in range(STEPS):
        state, comps = step_fn(state, batch, jax.random.PRNGKey(1))
        losses.append(float(comps["total"]))
        if i == 0:
            t0 = time.perf_counter()  # exclude compile
    dt = (time.perf_counter() - t0) / (STEPS - 1)
    return {"devices": n, "mesh": f"data={n // t},model={t}",
            "steps_per_sec": round(1.0 / dt, 2),
            "losses": [round(l, 5) for l in losses]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--tp", action="store_true")
    args = ap.parse_args()

    rows = []
    for n in (int(s) for s in args.devices.split(",")):
        row = run(n, args.tp)
        rows.append(row)
        print(json.dumps(row), flush=True)
    base = np.asarray(rows[0]["losses"])
    worst = max(float(np.max(np.abs(np.asarray(r["losses"]) - base)))
                for r in rows)
    ok = worst < 1e-3
    print(json.dumps({"loss_trajectories_match": ok,
                      "max_abs_loss_diff": round(worst, 6)}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
