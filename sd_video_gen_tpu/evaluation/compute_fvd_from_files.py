"""Offline FVD between two directories of frame PNGs.

Reference: evaluation/compute_fvd_from_files.py:33-78 — real frames vs
(FILM-interpolated) predicted frames read from disk, grouped into fixed-length
sequences, batched through I3D, final Fréchet distance.

Layout: ``--real_dir`` and ``--fake_dir`` each contain frame images; files are
sorted and grouped into sequences of ``--seq_len``. Nested directories (e.g.
``counter_*/interpolated_frames``) are crawled recursively.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.evaluation.fvd import frechet_distance, preprocess_videos
from sd_video_gen_tpu.evaluation.predict_fvd import load_i3d


def _frame_key(path: str):
    """Numeric-aware order: '10.png' must sort AFTER '9.png' — plain
    lexicographic sorting temporally scrambles the unpadded names this
    repo's own predict CLI writes (outputs/<n>/<i>.png)."""
    stem = os.path.splitext(os.path.basename(path))[0]
    digits = "".join(c for c in stem if c.isdigit())
    return (int(digits) if digits else 0, stem)


def _load_sequences(root: str, seq_len: int, max_seqs: int,
                    size: int) -> np.ndarray:
    paths = (glob.glob(os.path.join(root, "**", "*.png"), recursive=True)
             + glob.glob(os.path.join(root, "**", "*.jpg"), recursive=True))
    # group by directory: chunking one global list would splice sequences
    # across video boundaries whenever a video's frame count is not a
    # multiple of seq_len
    by_dir: dict = {}
    for pth in paths:
        by_dir.setdefault(os.path.dirname(pth), []).append(pth)
    seqs = []
    for d in sorted(by_dir):
        frames_paths = sorted(by_dir[d], key=_frame_key)
        for i in range(len(frames_paths) // seq_len):
            if len(seqs) >= max_seqs:
                break
            frames = [cv2.resize(cv2.imread(p), (size, size))
                      for p in frames_paths[i * seq_len:(i + 1) * seq_len]]
            seqs.append(np.stack(frames))
    if not seqs:
        raise FileNotFoundError(
            f"no complete {seq_len}-frame sequences under {root}")
    return np.stack(seqs)  # (N, T, H, W, 3)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--real_dir", required=True)
    p.add_argument("--fake_dir", required=True)
    p.add_argument("--seq_len", type=int, default=15)
    p.add_argument("--max_seqs", type=int, default=128 * 16)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--i3d_weights", type=str, default=None)
    args = p.parse_args(argv)

    i3d, params = load_i3d(args.i3d_weights)

    @jax.jit
    def features(v):
        return i3d.apply(params, preprocess_videos(v))

    def all_feats(root):
        seqs = _load_sequences(root, args.seq_len, args.max_seqs, args.size)
        outs = []
        for i in range(0, len(seqs), args.batch):
            outs.append(np.asarray(features(jnp.asarray(seqs[i:i + args.batch]))))
        return np.concatenate(outs)

    fvd = frechet_distance(all_feats(args.real_dir), all_feats(args.fake_dir))
    print(f"FVD: {fvd:.3f}")
    return fvd


if __name__ == "__main__":
    main()
