"""UCF-101 dataset: .avi clips via OpenCV, official split lists.

Replaces torchvision.datasets.UCF101 + the reference's lambda-transform
pipeline (trainers/trainer.py:389-421): decode at a target frame rate, resize
to ``frame_size`` (bilinear), optional horizontal flip, RGB->BGR is a no-op
here because cv2 already decodes BGR (the reference's final channel swap
existed to undo torchvision's RGB decode). Returns ``(label, frames)`` with
frames uint8 (T, H, W, 3) BGR — the reference's custom_collate order
(trainers/trainer.py:295-300).

Only host-side decode lives here; all tensor math is device-side in the
jitted step.
"""

from __future__ import annotations

import os
import glob

import numpy as np
import cv2


def find_classes(root: str) -> list[str]:
    return sorted(d for d in os.listdir(root)
                  if os.path.isdir(os.path.join(root, d)))


def _read_split_videos(label_dir: str, train: bool, fold: int = 1) -> set[str]:
    """Parse ucfTrainTestlist files -> set of 'Class/video.avi' names."""
    tag = "train" if train else "test"
    path = os.path.join(label_dir, f"{tag}list{fold:02d}.txt")
    names = set()
    with open(path) as f:
        for line in f:
            part = line.strip().split()
            if part:
                names.add(part[0])
    return names


def _decode_clips(video_path: str, frames_per_clip: int, frame_rate: float | None,
                  frame_size: int, max_clips: int | None = None):
    """Decode one video into consecutive non-overlapping resized clips."""
    cap = cv2.VideoCapture(video_path)
    native_fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    step = max(1, int(round(native_fps / frame_rate))) if frame_rate else 1
    clips, cur = [], []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % step == 0:
            # INTER_NEAREST: the reference resized UCF frames with torch
            # F.interpolate's default 'nearest' (trainers/trainer.py:397)
            cur.append(cv2.resize(frame, (frame_size, frame_size),
                                  interpolation=cv2.INTER_NEAREST))
            if len(cur) == frames_per_clip:
                clips.append(np.stack(cur, 0))
                cur = []
                if max_clips and len(clips) >= max_clips:
                    break
        i += 1
    cap.release()
    return clips


class UCF101Dataset:
    """Lazy clip index over the UCF .avi tree; decodes on access."""

    def __init__(self, data_dir: str, label_dir: str, frames_per_clip: int = 5,
                 train: bool = True, frame_rate: float | None = 3,
                 frame_size: int = 128, flip: bool = False,
                 clips_per_video: int = 4, seed: int = 0):
        self.frames_per_clip = frames_per_clip
        self.frame_rate = frame_rate
        self.frame_size = frame_size
        self.flip = flip
        self.clips_per_video = clips_per_video
        self._rng = np.random.default_rng(seed)

        self.classes = find_classes(data_dir)
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        split = _read_split_videos(label_dir, train)
        self.items = []  # (path, label, clip_idx)
        for c in self.classes:
            for p in sorted(glob.glob(os.path.join(data_dir, c, "*.avi"))):
                rel = f"{c}/{os.path.basename(p)}"
                if rel in split:
                    for k in range(clips_per_video):
                        self.items.append((p, self.class_to_idx[c], k))
        self._cache: dict[str, list] = {}

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int):
        path, label, k = self.items[index]
        if path not in self._cache:
            self._cache.clear()  # keep at most one decoded video resident
            self._cache[path] = _decode_clips(
                path, self.frames_per_clip, self.frame_rate, self.frame_size,
                max_clips=self.clips_per_video)
        clips = self._cache[path]
        if not clips:
            frames = np.zeros((self.frames_per_clip, self.frame_size,
                               self.frame_size, 3), np.uint8)
        else:
            frames = clips[k % len(clips)]
        if self.flip and self._rng.random() > 0.5:
            frames = frames[:, :, ::-1].copy()
        return [label] * self.frames_per_clip, frames

    @classmethod
    def from_args(cls, cfg, args, stage: str) -> "UCF101Dataset":
        # directory dispatch mirroring trainers/trainer.py:372-387
        if args.folder is not None:
            data_dir = args.folder
        else:
            suffix = {"ucf_wallpushups": "UCF-101-wallpushups",
                      "ucf_workout": "UCF-101-workout",
                      "ucf_instruments": "UCF-101-instruments",
                      "ucf": "UCF-101"}.get(args.dataset)
            if suffix is None:
                raise ValueError(f"Invalid dataset name {args.dataset}")
            data_dir = os.path.join("data/UCF-101", suffix)
        label_dir = getattr(
            args, "ucf_labels",
            "data/UCF101TrainTestSplits-RecognitionTask/ucfTrainTestlist")
        n = cfg.frames_per_clip
        if getattr(args, "train_mode", "ar") == "future":
            n = cfg.frames_per_clip + cfg.frames_to_predict
        return cls(data_dir, label_dir, frames_per_clip=n, train=stage == "train",
                   frame_rate=cfg.fps, frame_size=cfg.frame_size,
                   flip=bool(getattr(args, "flip", False)), seed=args.seed)
