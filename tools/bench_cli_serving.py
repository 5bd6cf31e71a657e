"""Measure the VERBATIM serving CLI (python -m prediction.predict) on the
north-star denoise pipeline — closing the "bench harness vs product CLI" gap.

bench.py's vae_denoise_ar4_8streams times the jitted pipeline body alone;
this tool drives the reference-compatible CLI end-to-end (dataset fetch ->
VAE encode -> AR rollout with the 10-step DDIM refine @512px -> VAE decode
-> optional PNG IO; reference counterpart prediction/predict.py:118-247)
and reports generated frames/sec from the CLI's own --timing line.

Method: ONE CLI invocation over n_batches serving batches; the CLI's
--timing line carries first_sync_s (the moment the first batch's results
were fetched — jit trace, XLA compile, and the first device round all land
before it), so

    steady_fps = (clips - streams) * pred_frames / (total_s - first_sync_s)

is the warm product-CLI serving rate over batches 2..N, comparable to the
bench scenario. (An earlier two-process marginal-subtraction design was
poisoned by per-process cold starts — measured at 200-270 s even on a
persistent-cache HIT: jit trace on a 1-core host + loading the ~170 MB
cached executable through the tunnel dominate, not recompilation — and by
a ragged tail batch triggering a fresh compile; measuring within one
process avoids both.)
Batch 2 overlaps the first sync point (the loop is software-pipelined one
batch deep), so steady_fps includes the pipeline overlap by design and
slightly flatters by at most one batch's overlap; with >=6 steady batches
the bias is <~15%% and shrinks with --n-batches.

Self-contained: synthetic bouncing-ball tree + a flagship-scale config
(DIM_MODEL 2048, 4 enc + 8 dec on 256-d VAE latents @64px) + a random-init
checkpoint in the trainer's Orbax format (weights don't affect throughput).

Usage:  python tools/bench_cli_serving.py [--workdir DIR] [--streams 8]
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

CONFIG_NAME = "cli_flagship"
CONFIG_YML = """\
# flagship dims (11_27_ucf_final.yml) at the bench's 64px serving shape
LR:
 - 1.0e-05
BATCH_SIZE:
 - 6
EPOCHS:
 - 1
EPOCH_RATIO:
 - 1
NUM_WORKERS:
 - 0
FRAMES_PER_CLIP:
 - 5
FRAMES_TO_PREDICT:
 - 4
STRIDE:
 - 1
FPS:
 - 3
FRAME_SIZE: 64
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


def prepare(workdir: str, need_clips: int) -> dict:
    """Synthetic data tree + config + random-init Orbax checkpoint."""
    import jax
    import jax.numpy as jnp
    import optax
    from sd_video_gen_tpu.codecs import make_codec
    from sd_video_gen_tpu.config import load_config
    from sd_video_gen_tpu.data.frame_datasets import BouncingBallDataset
    from sd_video_gen_tpu.data.synthetic import generate_bouncing_ball_tree
    from sd_video_gen_tpu.models import (FrameTransformer,
                                         FrameTransformerConfig)
    from sd_video_gen_tpu.ops.masks import causal_mask
    from sd_video_gen_tpu.train import checkpoint as ckpt
    from sd_video_gen_tpu.train.trainer import TrainState

    ball = os.path.join(workdir, "ball")
    cfg_dir = os.path.join(workdir, "configs")
    ckpt_dir = os.path.join(workdir, "checkpoints")
    os.makedirs(cfg_dir, exist_ok=True)
    if not os.path.isdir(os.path.join(ball, "test")):
        # clips step non-overlapping (reference loader semantics), so
        # 35-frame seqs yield 7 five-frame clips each
        n_seqs = max(2, (need_clips + 6) // 7)
        generate_bouncing_ball_tree(ball, n_train_seqs=1, n_test_seqs=n_seqs,
                                    frames_per_seq=35, size=64)
    with open(os.path.join(cfg_dir, CONFIG_NAME + ".yml"), "w") as f:
        f.write(CONFIG_YML)
    cfg = load_config(CONFIG_NAME, cfg_dir)
    have = len(BouncingBallDataset(num_frames=cfg.frames_per_clip,
                                   stride=cfg.stride, dir=ball, stage="test",
                                   seed=0))
    if have < need_clips:
        raise RuntimeError(f"synthetic tree yields {have} test clips; "
                           f"need {need_clips} — raise n_test_seqs")

    path = ckpt.checkpoint_path(ckpt_dir, CONFIG_NAME, 0, "test")
    if not os.path.isdir(path):
        codec = make_codec(cfg, "vae")
        model = FrameTransformer(FrameTransformerConfig.from_config(cfg))
        lat = jnp.zeros((1, cfg.frames_per_clip + 1, codec.latent_dim),
                        jnp.float32)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), lat, lat[:, :-1],
            tgt_mask=causal_mask(lat.shape[1] - 1))
        state = TrainState.create(apply_fn=model.apply, params=params,
                                  tx=optax.adam(cfg.lr))
        ckpt.save_checkpoint(path, state)
        ckpt.finalize_saves()
    return {"ball": ball, "cfg_dir": cfg_dir, "ckpt_dir": ckpt_dir}


def run_cli(paths: dict, max_clips: int, streams: int, pred: int,
            save_output: bool, timeout_s: float, sampler: str = "ddim",
            solver_steps: int | None = None) -> dict:
    cmd = [sys.executable, "-m", "prediction.predict",
           "--dataset", "ball", "--folder", paths["ball"],
           "--config", CONFIG_NAME, "--config_dir", paths["cfg_dir"],
           "--checkpoint_dir", paths["ckpt_dir"], "--index", "0",
           "--codec", "vae", "--denoise", "True",
           "--denoise_start_step", "40", "--pred_frames", str(pred),
           "--batch_clips", str(streams), "--max_clips", str(max_clips),
           "--save_output", str(save_output), "--timing", "--seed", "0",
           "--denoise_sampler", sampler]
    if solver_steps is not None:
        cmd += ["--denoise_solver_steps", str(solver_steps)]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout_s)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"CLI rc={proc.returncode}; stderr tail:\n"
                           + proc.stderr[-2000:])
    timing = None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            timing = json.loads(line)
    if timing is None:
        raise RuntimeError("no --timing JSON in CLI stdout:\n"
                           + proc.stdout[-2000:])
    timing["wall_s"] = round(wall, 3)
    return timing


def run_serve_bench(paths: dict, streams: int, pred: int, n_requests: int,
                    timeout_s: float, sampler: str = "ddim",
                    solver_steps: int | None = None) -> dict:
    """Persistent serving mode (predict --serve): time-to-first-frame.

    Launches ONE server process, waits for SERVE_READY (the once-per-host
    warmup: jit trace + compile + first device round), then measures
    per-request latency over the socket — request 1's latency IS the
    time-to-first-frame of a warm server, the number the one-shot CLI pays
    200-270 s for (BASELINE.md cold-start attribution)."""
    import numpy as np
    from sd_video_gen_tpu.predict import serve as S

    sock = os.path.join(paths["cfg_dir"], "..", "serve.sock")
    cmd = [sys.executable, "-m", "prediction.predict",
           "--dataset", "ball", "--folder", paths["ball"],
           "--config", CONFIG_NAME, "--config_dir", paths["cfg_dir"],
           "--checkpoint_dir", paths["ckpt_dir"], "--index", "0",
           "--codec", "vae", "--denoise", "True",
           "--denoise_start_step", "40", "--pred_frames", str(pred),
           "--batch_clips", str(streams), "--seed", "0",
           "--denoise_sampler", sampler, "--serve", sock]
    if solver_steps is not None:
        cmd += ["--denoise_solver_steps", str(solver_steps)]
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}".rstrip(":")
    t_launch = time.perf_counter()
    proc = subprocess.Popen(cmd, cwd=REPO, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        ready_line = None
        deadline = t_launch + timeout_s
        for line in proc.stdout:
            if line.startswith("SERVE_READY"):
                ready_line = json.loads(line.split(" ", 1)[1])
                break
            if time.perf_counter() > deadline:
                raise TimeoutError("server never printed SERVE_READY")
        if ready_line is None:
            raise RuntimeError(f"server exited rc={proc.wait()} before READY")
        ready_wall = time.perf_counter() - t_launch

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (streams, 5, 64, 64, 3)).astype(
            np.uint8)
        latencies = []
        for _ in range(n_requests):
            t0 = time.perf_counter()
            imgs, is_pred, hdr = S.request(sock, frames,
                                           timeout_s=timeout_s)
            latencies.append(time.perf_counter() - t0)
        assert sum(is_pred) == pred and imgs.shape[0] == streams
        S.shutdown(sock)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    steady = sorted(latencies[1:])[len(latencies[1:]) // 2]
    return {
        "server_ready_wall_s": round(ready_wall, 2),
        "server_warmup_s": ready_line["ready_s"],
        "ttff_warm_server_s": round(latencies[0], 3),
        "steady_request_s_median": round(steady, 3),
        "steady_fps": round(streams * pred / steady, 2),
        "request_latencies_s": [round(x, 3) for x in latencies],
        "n_requests": n_requests}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/sdvg_cli_serving")
    ap.add_argument("--streams", type=int, default=8,
                    help="--batch_clips (bench saturation point: 8)")
    ap.add_argument("--pred_frames", type=int, default=4)
    ap.add_argument("--n_batches", type=int, default=8,
                    help="serving batches; batch 1 absorbs trace+compile")
    ap.add_argument("--save_output", action="store_true",
                    help="also write the red-border PNGs (IO overlap check)")
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "dpmpp"],
                    help="forwarded to predict --denoise_sampler")
    ap.add_argument("--solver_steps", type=int, default=None,
                    help="forwarded to predict --denoise_solver_steps")
    ap.add_argument("--cli_timeout_s", type=float, default=1800)
    ap.add_argument("--mode", default="batch", choices=["batch", "serve"],
                    help="batch: one-shot CLI steady-rate (default); serve: "
                         "persistent server TTFF + per-request latency")
    ap.add_argument("--n_requests", type=int, default=6,
                    help="serve mode: requests after SERVE_READY")
    args = ap.parse_args()
    if args.n_batches < 3:
        ap.error("--n_batches must be >=3 for a meaningful steady window")

    # This parent needs jax only to init/save the random checkpoint —
    # pin it to CPU so it never opens a tunnel session: a held session
    # can starve the measured CLI child's own session (observed r4: a
    # held tunnel session + a concurrently-opened one -> the second hangs
    # >300 s with the relay up). The CLI children are bounded by
    # --cli_timeout_s.
    from sd_video_gen_tpu.utils.backend import force_cpu
    force_cpu()
    max_clips = args.n_batches * args.streams  # exact multiple: one program
    os.makedirs(args.workdir, exist_ok=True)
    paths = prepare(args.workdir, max_clips)

    if args.mode == "serve":
        r = run_serve_bench(paths, args.streams, args.pred_frames,
                            args.n_requests, args.cli_timeout_s,
                            sampler=args.sampler,
                            solver_steps=args.solver_steps)
        r.update({
            "metric": "cli_serving_persistent_ttff",
            "streams": args.streams, "pred_frames": args.pred_frames,
            "sampler": args.sampler, "solver_steps": args.solver_steps,
            "note": "ttff_warm_server_s is what replaces the one-shot "
                    "CLI's 200-270s per-process cold start; the warmup is "
                    "paid once at server start (server_warmup_s)"})
        print(json.dumps(r))
        return

    t = run_cli(paths, max_clips, args.streams, args.pred_frames,
                args.save_output, args.cli_timeout_s,
                sampler=args.sampler, solver_steps=args.solver_steps)
    if t["clips"] != max_clips or not t.get("first_sync_s"):
        raise RuntimeError(f"unexpected timing payload: {t}")
    steady_clips = t["clips"] - args.streams
    steady_s = t["total_s"] - t["first_sync_s"]
    steady = steady_clips * args.pred_frames / steady_s
    absolute = t["clips"] * args.pred_frames / t["total_s"]
    print(json.dumps({
        "metric": "cli_serving_denoise_frames_per_sec",
        "steady_fps": round(steady, 2),
        "absolute_fps_incl_startup": round(absolute, 2),
        "streams": args.streams, "pred_frames": args.pred_frames,
        "batches": args.n_batches, "save_output": args.save_output,
        "sampler": args.sampler, "solver_steps": args.solver_steps,
        "timing": t,
        "note": "steady = batches 2..N of one CLI process (trace/compile/"
                "first device round excluded), comparable to bench.py "
                "vae_denoise_ar4_%dstreams" % args.streams}))


if __name__ == "__main__":
    main()
