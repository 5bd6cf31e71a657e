"""Measure the VERBATIM training CLI (python -m trainers.trainer) against
bench.py's train_flagship scenario — the training-side twin of
tools/bench_cli_serving.py.

bench.py times the jitted train step on synthetic device-resident frames;
this tool drives the reference-compatible CLI end-to-end (C++ native-cache
input -> device put -> jitted step -> epoch metrics -> checkpoint) at the
same operating point (flagship dims, batch 6, 10-frame 128px clips,
bf16_full) and reads the per-step rate off the trainer's own metrics JSONL
(`step_ms_*` from utils/profiling.StepTimer). Reference counterpart:
trainers/trainer.py:111-190.

The first epoch absorbs the jit compile (its p95 is the compile); warm
epochs' step_ms_mean is the steady CLI rate. Timer semantics: StepTimer
clocks device_put + dispatch, which converges to the device step time
under JAX's bounded dispatch queue backpressure — EXCEPT that the last
in-flight step of each epoch drains inside the untimed epoch-end metrics
sync, so an 8-step epoch under-reads by up to 1/8 (16 ms true -> ~14 ms
reported). Read the result as "CLI adds no overhead over the harness
rate", not as a chip speedup.

Measured 2026-08-19 (TPU v5e-1): warm epochs 12.4-16.5 ms/step across
two runs, consistent with bench.py train_flagship's 16.06 ms
(62.3 steps/s) under the 1/8 drain bias; loss decreasing (train
4.83 -> 2.99 over 4 epochs on synthetic ball data); compile epoch p95
11.9 s warm-cache / 40.9 s cold.

Usage:  python tools/bench_cli_train.py [--workdir DIR] [--epochs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIG_NAME = "cli_flag128"
CONFIG_YML = """\
# flagship dims (11_27_ucf_final.yml); 10-frame clips match bench.py's
# scenario_train shape (5 context + 5 predict)
LR:
 - 1.0e-05
BATCH_SIZE:
 - 6
EPOCHS:
 - {epochs}
EPOCH_RATIO:
 - 1
NUM_WORKERS:
 - 4
FRAMES_PER_CLIP:
 - 10
FRAMES_TO_PREDICT:
 - 5
STRIDE:
 - 1
FPS:
 - 3
FRAME_SIZE: 128
DIM_MODEL:
 - 2048
NUM_HEADS:
 - 8
NUM_ENCODER_LAYERS:
 - 4
NUM_DECODER_LAYERS:
 - 8
DROPOUT_P:
 - 0.1
USE_MSE:
 - true
USE_GDL:
 - true
LAMBDA_GDL:
 - 1
ALPHA:
 - 1
USE_CONTRASTIVE:
 - true
LAMBDA_CONTRASTIVE:
 - 0.025
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/sdvg_cli_train")
    ap.add_argument("--epochs", type=int, default=4,
                    help="epoch 1 absorbs the compile; >=3 warm epochs")
    ap.add_argument("--precision", default="bf16_full",
                    choices=["f32", "bf16", "bf16_full"])
    ap.add_argument("--timeout_s", type=float, default=1800)
    args = ap.parse_args()
    if args.epochs < 2:
        ap.error("--epochs must be >=2 (epoch 1 is the compile epoch)")

    # Deliberately NO backend init here: the parent never touches the
    # device, and a live parent tunnel session starves the trainer child's
    # own session (observed r4: a held session + a concurrently-opened one
    # -> the second hangs >300 s with the relay up). The child trainer is
    # bounded by --timeout_s instead.
    w = args.workdir
    ball, cfg_dir, cache = (os.path.join(w, d)
                            for d in ("ball", "configs", "cache"))
    os.makedirs(cfg_dir, exist_ok=True)
    with open(os.path.join(cfg_dir, CONFIG_NAME + ".yml"), "w") as f:
        f.write(CONFIG_YML.format(epochs=args.epochs))
    if not os.path.isdir(os.path.join(ball, "test")):
        from sd_video_gen_tpu.data.synthetic import generate_bouncing_ball_tree
        # 16 train seqs x 30 frames -> 48 ten-frame clips = 8 batches of 6
        generate_bouncing_ball_tree(ball, n_train_seqs=16, n_test_seqs=4,
                                    frames_per_seq=30, size=128)
    # the trainer runs with cwd=workdir (so logs/ lands there) — the repo
    # root must be importable, and any existing entries (e.g. the axon
    # platform plugin's site dir) must survive
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + (os.pathsep + env["PYTHONPATH"]
                                if env.get("PYTHONPATH") else "")
    if not os.path.isfile(os.path.join(cache, "train.bin")):
        subprocess.run(
            [sys.executable, "-m", "sd_video_gen_tpu.data.native_loader",
             "--dataset", "ball", "--folder", ball,
             "--config", CONFIG_NAME, "--config_dir", cfg_dir,
             "--out", cache], cwd=REPO, env=env, check=True,
            capture_output=True, text=True)

    log = os.path.join(w, "logs", f"{CONFIG_NAME}_0.jsonl")
    if os.path.exists(log):
        os.unlink(log)
    # fresh checkpoint dir: the trainer names runs <config>_<index> by
    # counting existing checkpoints, and the log path above assumes index 0
    import shutil
    shutil.rmtree(os.path.join(w, "checkpoints"), ignore_errors=True)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "trainers.trainer", "--dataset", "ball",
         "--config", CONFIG_NAME, "--config_dir", cfg_dir,
         "--folder", ball, "--native_cache", cache,
         "--precision", args.precision, "--debug", "True",
         "--ckpt_every", "99", "--seed", "0",
         "--checkpoint_dir", os.path.join(w, "checkpoints")],
        cwd=w, env=env, capture_output=True, text=True,
        timeout=args.timeout_s)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"trainer rc={proc.returncode}; stderr tail:\n"
                           + proc.stderr[-2000:])
    rows = [r for r in (json.loads(l) for l in open(log))
            if "step_ms_mean" in r]  # skip init/event rows
    warm = rows[1:]
    if not warm:
        raise RuntimeError("need >=2 epochs in the metrics log")
    mean_ms = sum(r["step_ms_mean"] for r in warm) / len(warm)
    batch = 6
    print(json.dumps({
        "metric": "cli_train_flagship_steps_per_sec",
        "steady_steps_per_s": round(1e3 / mean_ms, 2),
        "steady_clips_per_s": round(1e3 / mean_ms * batch, 1),
        "warm_epoch_step_ms": [round(r["step_ms_mean"], 2) for r in warm],
        "compile_epoch_p95_ms": round(rows[0]["step_ms_p95"], 1),
        "train_loss_first_last": [round(rows[0]["train_loss"], 3),
                                  round(rows[-1]["train_loss"], 3)],
        "precision": args.precision, "wall_s": round(wall, 1),
        "note": "steady = warm-epoch step_ms_mean from the trainer's own "
                "metrics JSONL; comparable to bench.py train_flagship "
                "(16.06 ms/step bf16_full)"}))


if __name__ == "__main__":
    main()
