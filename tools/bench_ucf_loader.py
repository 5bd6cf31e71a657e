"""UCF101 loader throughput: video-grouped epoch order vs clip shuffle.

VERDICT r1 item 4 asked for a loader-throughput number showing the decode
strategy keeps the train step fed. Synthesizes a small UCF tree (longer
videos than the unit fixture so each holds many clips), then measures
clips/sec for:
  grouped  — epoch_order (videos shuffled, clips sequential): one decode
             per video per epoch (the default in the trainer);
  shuffled — reference RandomSampler-style clip-level shuffle: the decode
             cache misses on almost every fetch.

Numbers are host-CPU bound (1 core here); the ratio is the point — and the
absolute grouped number should exceed train-step demand
(steps/sec x batch clips/step: flagship 35.9 x 6 ≈ 215 clips/s on v5e).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import cv2

from sd_video_gen_tpu.data.ucf101 import UCF101Dataset

N_VIDEOS = 8
FRAMES = 120
SIZE = 64


def build_tree(root):
    data = os.path.join(root, "UCF-101")
    cls = "ApplyLipstick"
    os.makedirs(os.path.join(data, cls))
    names = []
    for vi in range(N_VIDEOS):
        name = f"v_{cls}_g{vi:02d}_c01.avi"
        vw = cv2.VideoWriter(os.path.join(data, cls, name),
                             cv2.VideoWriter_fourcc(*"MJPG"), 12.0,
                             (SIZE, SIZE))
        rng = np.random.default_rng(vi)
        for _ in range(FRAMES):
            vw.write(rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8))
        vw.release()
        names.append(f"{cls}/{name}")
    splits = os.path.join(root, "splits")
    os.makedirs(splits)
    with open(os.path.join(splits, "trainlist01.txt"), "w") as f:
        for n in names:
            f.write(f"{n} 1\n")
    with open(os.path.join(splits, "testlist01.txt"), "w") as f:
        f.write(names[0] + "\n")
    return data, splits


def measure(ds, order):
    t0 = time.perf_counter()
    for idx in order:
        _ = ds[int(idx)]
    dt = time.perf_counter() - t0
    return len(order) / dt


def main():
    with tempfile.TemporaryDirectory() as root:
        data, splits = build_tree(root)
        # cache_videos=2 << N_VIDEOS emulates real UCF (13K videos >> any
        # cache): grouped order stays hot, clip-shuffle thrashes.
        ds = UCF101Dataset(data, splits, frames_per_clip=10, train=True,
                           frame_rate=None, frame_size=SIZE, cache_videos=2)
        n = len(ds)
        rng = np.random.default_rng(0)
        grouped = ds.epoch_order(rng)
        shuffled = rng.permutation(n)
        _ = ds[0]  # warm codec/cache machinery
        g = measure(ds, grouped)
        s = measure(ds, shuffled)

        # native path: one-time cache build, then the C++ loader serves
        # fully-shuffled batches from the mmap — decode cost paid once ever,
        # not once per epoch, and sampling/augment run outside the GIL.
        from sd_video_gen_tpu.data.native_loader import (build_frame_cache,
                                                         NativeBatchLoader)
        cache_dir = os.path.join(root, "cache")
        t0 = time.perf_counter()
        build_frame_cache(ds, cache_dir, "train")
        t_build = time.perf_counter() - t0
        loader = NativeBatchLoader(cache_dir, "train", batch_size=32,
                                   n_threads=2, seed=0)
        for _ in loader:  # warm epoch (page cache)
            pass
        t0 = time.perf_counter()
        served = 0
        for _, frames in loader:
            served += len(frames)
        nat = served / (time.perf_counter() - t0)
        loader.close()

        print(json.dumps({"clips": n, "grouped_clips_per_sec": round(g, 1),
                          "clip_shuffled_clips_per_sec": round(s, 1),
                          "speedup": round(g / s, 1),
                          "native_clips_per_sec": round(nat, 1),
                          "native_cache_build_sec": round(t_build, 2),
                          "native_vs_grouped": round(nat / g, 1)}))


if __name__ == "__main__":
    main()
