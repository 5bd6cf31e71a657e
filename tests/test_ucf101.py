"""UCF101Dataset over synthetic .avi files + official-format split lists."""

import os

import numpy as np
import cv2
import pytest

from sd_video_gen_tpu.data.ucf101 import UCF101Dataset, find_classes


@pytest.fixture(scope="module")
def ucf_tree(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ucf")
    data = tmp / "UCF-101"
    rng = np.random.default_rng(0)
    names = {}
    for ci, cls in enumerate(["ApplyLipstick", "WallPushups"]):
        (data / cls).mkdir(parents=True)
        for vi in range(3):
            name = f"v_{cls}_g{vi:02d}_c01.avi"
            path = data / cls / name
            vw = cv2.VideoWriter(str(path),
                                 cv2.VideoWriter_fourcc(*"MJPG"), 12.0,
                                 (48, 36))
            for t in range(24):
                frame = np.full((36, 48, 3), (ci * 40 + vi * 5 + t * 8) % 240,
                                np.uint8)
                vw.write(frame)
            vw.release()
            names.setdefault(cls, []).append(f"{cls}/{name}")
    labels = tmp / "splits"
    labels.mkdir()
    with open(labels / "trainlist01.txt", "w") as f:
        for cls, vs in names.items():
            for v in vs[:2]:
                f.write(f"{v} 1\n")
    with open(labels / "testlist01.txt", "w") as f:
        for cls, vs in names.items():
            f.write(f"{vs[2]}\n")
    return str(data), str(labels)


def test_find_classes(ucf_tree):
    data, _ = ucf_tree
    assert find_classes(data) == ["ApplyLipstick", "WallPushups"]


def test_train_split_and_shapes(ucf_tree):
    data, labels = ucf_tree
    ds = UCF101Dataset(data, labels, frames_per_clip=4, train=True,
                       frame_rate=6, frame_size=32, clips_per_video=2)
    # 2 classes * 2 train videos * 2 clips
    assert len(ds) == 8
    label_ids, frames = ds[0]
    assert frames.shape == (4, 32, 32, 3) and frames.dtype == np.uint8
    assert label_ids == [0] * 4
    # decode respects frame-rate subsampling: native 12fps @ rate 6 -> step 2
    # => consecutive clip frames differ by ~16 in the fill value (8/frame,
    # MJPG is lossy so allow slack)
    vals = [int(frames[t, 16, 16, 0]) for t in range(4)]
    assert 10 <= vals[1] - vals[0] <= 22


def test_test_split(ucf_tree):
    data, labels = ucf_tree
    ds = UCF101Dataset(data, labels, frames_per_clip=4, train=False,
                       frame_rate=None, frame_size=32, clips_per_video=1)
    assert len(ds) == 2  # one test video per class
    labels_seen = sorted(ds[i][0][0] for i in range(len(ds)))
    assert labels_seen == [0, 1]


def test_flip(ucf_tree):
    data, labels = ucf_tree
    ds = UCF101Dataset(data, labels, frames_per_clip=4, train=True,
                       frame_rate=None, frame_size=32, flip=True, seed=0)
    # with flip on, repeated access eventually flips (uniform frames make
    # flip invisible; just check it runs and returns valid shapes)
    _, frames = ds[1]
    assert frames.shape == (4, 32, 32, 3)
