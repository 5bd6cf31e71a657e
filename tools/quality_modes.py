"""Learning-evidence experiment for ALL four training modes (VERDICT r4 #5).

The reference's own end-to-end quality control is the Identity copy-baseline
(prediction/predict_naive_fvd.py:80, models/identity.py:13-16): a trained
model must beat "predict next frame = last frame" on FVD and pixel MSE.
Round 3 ran that control for the AR mode only; this harness extends it to
every training mode the reference ships a trainer for
(trainers/trainer_diff.py:140-142, trainer_predict_future.py:146,
trainer_text.py:177) plus the AR arm re-run under the identical protocol:

  for mode in {ar, diff, future, text}:
    train on synthetic data ON CHIP via the verbatim trainer CLI
    score trained vs Identity with the FVD eval CLI (same protocol both arms)

ar/diff/future train on the bouncing-ball tree; text needs class labels, so
it trains on a synthetic two-class UCF-format .avi tree whose classes have
OPPOSITE horizontal motion (SlideLeft/SlideRight) — the class name is the
only way to disambiguate the first-frame direction, so text conditioning is
load-bearing, not decorative.

FVD uses the random-init I3D protocol (self-consistent: identical featurizer
for both arms; values are not comparable to published FVDs). The pass
criterion per mode: trained FVD < naive FVD AND trained MSE < naive MSE.

Run: python tools/quality_modes.py [--scratch DIR] [--epochs N]
     [--modes ar,diff,future,text] [--skip_train]
Emits a markdown table + JSON verdict; exits 1 if any mode fails its gate.

The parent only orchestrates subprocesses and never initializes any jax
backend (tunnel-session discipline: a parent holding an idle session can
starve its children's sessions).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BALL_CFG = """\
LR:
 - 3.0e-04
BATCH_SIZE:
 - 8
EPOCHS:
 - {epochs}
EPOCH_RATIO:
 - 1
NUM_WORKERS:
 - 0
FRAMES_PER_CLIP:
 - 5
FRAMES_TO_PREDICT:
 - 5
STRIDE:
 - 2
FPS:
 - 12
FRAME_SIZE: 64
DIM_MODEL:
 - 1024
NUM_HEADS:
 - 8
NUM_ENCODER_LAYERS:
 - 2
NUM_DECODER_LAYERS:
 - 4
DROPOUT_P:
 - 0.1
USE_MSE:
 - true
USE_GDL:
 - true
LAMBDA_GDL:
 - true
ALPHA:
 - 2
"""


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}".rstrip(":")
    ax = "/root/.axon_site"
    if os.path.isdir(ax) and ax not in env["PYTHONPATH"]:
        env["PYTHONPATH"] += f":{ax}"
    return env


def _run(cmd, cwd, log_path, timeout_s):
    t0 = time.time()
    with open(log_path, "a") as log:
        log.write(f"\n$ {' '.join(cmd)}\n")
        log.flush()
        proc = subprocess.run(cmd, cwd=cwd, env=_env(), stdout=log,
                              stderr=subprocess.STDOUT, timeout=timeout_s)
    dt = time.time() - t0
    if proc.returncode != 0:
        tail = open(log_path).read()[-1500:]
        raise RuntimeError(
            f"rc={proc.returncode} after {dt:.0f}s: {' '.join(cmd)}\n{tail}")
    return dt


def make_ucf_tree(root: str, frame_size: int = 64) -> tuple[str, str]:
    """Two-class UCF-format .avi tree with class-dependent motion.

    SlideLeft / SlideRight: a bright square slides horizontally, direction
    set by the class. From any 5-frame context the direction IS visible, but
    the Identity baseline cannot track it; the text table gives the model an
    extra per-class cue (same layout as UCF class names,
    trainers/trainer_text.py:39-68).
    """
    import numpy as np
    import cv2
    data = os.path.join(root, "UCF-101")
    splits = os.path.join(root, "splits")
    os.makedirs(splits, exist_ok=True)
    rng = np.random.default_rng(0)
    names: dict[str, list[str]] = {}
    for ci, (cls, vx) in enumerate([("SlideLeft", -3), ("SlideRight", 3)]):
        os.makedirs(os.path.join(data, cls), exist_ok=True)
        for vi in range(8):
            name = f"v_{cls}_g{vi:02d}_c01.avi"
            vw = cv2.VideoWriter(os.path.join(data, cls, name),
                                 cv2.VideoWriter_fourcc(*"MJPG"), 12.0,
                                 (frame_size, frame_size))
            x = int(rng.integers(16, frame_size - 16))
            y = int(rng.integers(8, frame_size - 16))
            shade = int(rng.integers(160, 250))
            for _ in range(24):
                frame = np.zeros((frame_size, frame_size, 3), np.uint8)
                x = (x + vx) % frame_size
                frame[y:y + 10, x:min(x + 10, frame_size)] = shade
                vw.write(frame)
            vw.release()
            names.setdefault(cls, []).append(f"{cls}/{name}")
    with open(os.path.join(splits, "trainlist01.txt"), "w") as f:
        for cls, vs in names.items():
            for v in vs[:6]:
                f.write(f"{v} 1\n")
    with open(os.path.join(splits, "testlist01.txt"), "w") as f:
        for cls, vs in names.items():
            for v in vs[6:]:
                f.write(f"{v}\n")
    return data, splits


_RESULT_RE = re.compile(
    r"FVD \((?:streaming|batch), (\d+) clips\): ([0-9.]+)\s+pred MSE: "
    r"([0-9.eE+-]+)")


def parse_result(log_path: str):
    m = None
    for m in _RESULT_RE.finditer(open(log_path).read()):
        pass
    if m is None:
        raise RuntimeError(f"no FVD result line in {log_path}")
    return int(m.group(1)), float(m.group(2)), float(m.group(3))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scratch", default="/tmp/qual5")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--modes", default="ar,diff,future,text")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse checkpoints from a previous run")
    ap.add_argument("--max_clips", type=int, default=14)
    ap.add_argument("--batch_clips", type=int, default=7)
    ap.add_argument("--train_timeout_s", type=float, default=3600)
    ap.add_argument("--eval_timeout_s", type=float, default=2400)
    args = ap.parse_args(argv)
    modes = args.modes.split(",")

    os.makedirs(args.scratch, exist_ok=True)
    ball_dir = os.path.join(args.scratch, "ball")
    if not os.path.isdir(os.path.join(ball_dir, "train")):
        sys.path.insert(0, REPO)
        from sd_video_gen_tpu.data.synthetic import (
            generate_bouncing_ball_tree)
        generate_bouncing_ball_tree(ball_dir, 24, 6, 30, 64)
    ucf_root = os.path.join(args.scratch, "ucf")
    if not os.path.isdir(os.path.join(ucf_root, "UCF-101")):
        ucf_data, ucf_splits = make_ucf_tree(ucf_root)
    else:
        ucf_data = os.path.join(ucf_root, "UCF-101")
        ucf_splits = os.path.join(ucf_root, "splits")

    results = {}
    for mode in modes:
        wd = os.path.join(args.scratch, mode)
        cfg_dir = os.path.join(wd, "configs")
        os.makedirs(cfg_dir, exist_ok=True)
        with open(os.path.join(cfg_dir, "q5.yml"), "w") as f:
            f.write(BALL_CFG.format(epochs=args.epochs))
        log = os.path.join(wd, "run.log")
        is_text = mode == "text"
        dataset = ["--dataset", "ucf" if is_text else "ball"]
        folder = ["--folder", ucf_data if is_text else ball_dir]
        labels = ["--ucf_labels", ucf_splits] if is_text else []
        common = dataset + folder + labels + [
            "--config", "q5", "--config_dir", "configs",
            "--train_mode", mode, "--debug", "True", "--seed", "0"]

        if not args.skip_train:
            dt = _run([sys.executable, "-m", "trainers.trainer",
                       *common, "--ckpt_every", "1000"],
                      wd, log, args.train_timeout_s)
            print(f"[{mode}] trained {args.epochs} epochs in {dt:.0f}s",
                  flush=True)

        entry = {}
        for arm, extra in (("trained", []), ("naive", ["--naive", "True"])):
            _run([sys.executable, "-m", "evaluation.predict_fvd",
                  *common, *extra, "--pred_frames", "4",
                  "--max_clips", str(args.max_clips),
                  "--batch_clips", str(args.batch_clips)],
                 wd, log, args.eval_timeout_s)
            n, fvd, mse = parse_result(log)
            entry[arm] = {"clips": n, "fvd": fvd, "mse": mse}
            print(f"[{mode}] {arm}: FVD {fvd:.3f}  MSE {mse:.5f} "
                  f"({n} clips)", flush=True)
        entry["pass"] = (entry["trained"]["fvd"] < entry["naive"]["fvd"]
                         and entry["trained"]["mse"] < entry["naive"]["mse"])
        results[mode] = entry

    print("\n| mode | FVD trained | FVD naive | MSE trained | MSE naive "
          "| beats Identity |")
    print("|---|---|---|---|---|---|")
    for mode, e in results.items():
        print(f"| {mode} | {e['trained']['fvd']:.3f} "
              f"| {e['naive']['fvd']:.3f} | {e['trained']['mse']:.5f} "
              f"| {e['naive']['mse']:.5f} "
              f"| {'YES' if e['pass'] else 'NO'} |")
    out = os.path.join(args.scratch, "quality_modes.json")
    merged = {}
    if os.path.exists(out):  # partial runs per --modes accumulate
        with open(out) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"\nwrote {out}")
    return 0 if all(e["pass"] for e in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
