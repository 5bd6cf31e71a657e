"""UCF101Dataset over synthetic .avi files + official-format split lists.

Includes torchvision-parity goldens for the clip enumeration: the reference
uses torchvision.datasets.UCF101 (trainers/trainer.py:409-421) whose
VideoClips resamples each video's timeline to frame_rate and takes ALL
sliding windows with step_between_clips=1. torchvision is not installed
here, so the goldens below are hand-evaluated from its documented formula
(VideoClips._resample_video_idx / unfold).
"""

import os

import numpy as np
import cv2
import pytest

from sd_video_gen_tpu.data.ucf101 import (UCF101Dataset, clip_starts,
                                          find_classes, resample_indices)


def test_resample_indices_integer_step():
    # torchvision: step = 12/6 = 2.0 integer -> slice(None, None, 2)
    np.testing.assert_array_equal(resample_indices(24, 12.0, 6),
                                  np.arange(0, 24, 2))
    # T not divisible by step: slice semantics keep ceil(T/step) frames
    np.testing.assert_array_equal(resample_indices(25, 12.0, 6),
                                  np.arange(0, 25, 2))


def test_resample_indices_fractional_step():
    # torchvision: step = 10/4 = 2.5, n = floor(25 * 4/10) = 10,
    # idxs = floor(arange(10) * 2.5)
    np.testing.assert_array_equal(
        resample_indices(25, 10.0, 4),
        np.array([0, 2, 5, 7, 10, 12, 15, 17, 20, 22]))


def test_resample_indices_no_rate():
    np.testing.assert_array_equal(resample_indices(5, 30.0, None),
                                  np.arange(5))


def test_clip_starts_unfold_semantics():
    # torchvision unfold: (n - size)//step + 1 windows
    np.testing.assert_array_equal(clip_starts(12, 4, 1), np.arange(9))
    np.testing.assert_array_equal(clip_starts(12, 4, 3), [0, 3, 6])
    assert len(clip_starts(3, 4, 1)) == 0
    np.testing.assert_array_equal(clip_starts(4, 4, 1), [0])


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


def test_full_sliding_enumeration(ucf_tree):
    """clips_per_video=None -> torchvision behavior: every sliding window.
    24 frames @12fps resampled to 6fps -> 12 frames; L=4, step 1 -> 9 clips
    per video; 4 train videos -> 36."""
    data, labels = ucf_tree
    ds = UCF101Dataset(data, labels, frames_per_clip=4, train=True,
                       frame_rate=6, frame_size=32)
    assert len(ds) == 36
    # consecutive sliding clips overlap by 3 frames
    _, c0 = ds[0]
    _, c1 = ds[1]
    np.testing.assert_array_equal(c0[1:], c1[:3])


def test_epoch_order_groups_videos(ucf_tree):
    data, labels = ucf_tree
    ds = UCF101Dataset(data, labels, frames_per_clip=4, train=True,
                       frame_rate=6, frame_size=32)
    order = ds.epoch_order(np.random.default_rng(0))
    assert sorted(order) == list(range(len(ds)))
    vids = [ds.items[i][0] for i in order]
    # each video's clips are contiguous in the order (cache-friendly)
    seen = []
    for v in vids:
        if not seen or seen[-1] != v:
            assert v not in seen, "video revisited after eviction"
            seen.append(v)


def test_video_decoded_once_per_epoch(ucf_tree, monkeypatch):
    import sd_video_gen_tpu.data.ucf101 as mod
    data, labels = ucf_tree
    ds = UCF101Dataset(data, labels, frames_per_clip=4, train=True,
                       frame_rate=6, frame_size=32, cache_videos=2)
    calls = []
    real = mod._decode_resampled
    monkeypatch.setattr(mod, "_decode_resampled",
                        lambda *a: calls.append(1) or real(*a))
    for i in ds.epoch_order(np.random.default_rng(1)):
        ds[int(i)]
    assert len(calls) == len(ds.videos)


def test_batchloader_uses_epoch_order(ucf_tree, monkeypatch):
    from sd_video_gen_tpu.data.pipeline import BatchLoader
    import sd_video_gen_tpu.data.ucf101 as mod
    data, labels = ucf_tree
    ds = UCF101Dataset(data, labels, frames_per_clip=4, train=True,
                       frame_rate=6, frame_size=32, cache_videos=1)
    calls = []
    real = mod._decode_resampled
    monkeypatch.setattr(mod, "_decode_resampled",
                        lambda *a: calls.append(1) or real(*a))
    loader = BatchLoader(ds, batch_size=4, prefetch=0, seed=0)
    nb = sum(1 for _ in loader)
    assert nb == len(ds) // 4
    # video-grouped sampling: even a 1-video cache decodes each video once
    assert len(calls) == len(ds.videos)


def test_flip(ucf_tree):
    data, labels = ucf_tree
    ds = UCF101Dataset(data, labels, frames_per_clip=4, train=True,
                       frame_rate=None, frame_size=32, flip=True, seed=0)
    # with flip on, repeated access eventually flips (uniform frames make
    # flip invisible; just check it runs and returns valid shapes)
    _, frames = ds[1]
    assert frames.shape == (4, 32, 32, 3)


def test_from_args_policies(ucf_tree):
    """Length/augment policy ownership (review regressions): learned_tgt
    extends like future; test-stage never flips; exact_frames overrides
    every extension so eval callers cannot double-extend."""
    from types import SimpleNamespace

    from sd_video_gen_tpu.config import Config

    data_dir, label_dir = ucf_tree
    cfg = Config(config_name="t", frames_per_clip=4, frames_to_predict=3,
                 frame_size=32, fps=6)
    mk = lambda mode, stage, exact=None: UCF101Dataset.from_args(
        cfg, SimpleNamespace(folder=data_dir, dataset="ucf",
                             ucf_labels=label_dir, train_mode=mode,
                             flip=True, seed=0), stage, exact_frames=exact)
    assert mk("ar", "train").frames_per_clip == 4
    assert mk("future", "train").frames_per_clip == 7
    # learned_tgt trains via the future split: without the extension its
    # encoder input would be EMPTY (zero conditioning context)
    assert mk("learned_tgt", "train").frames_per_clip == 7
    # exact_frames pins the length regardless of mode
    assert mk("future", "test", exact=9).frames_per_clip == 9
    # flip is train-only: flipping val clips randomizes val loss / FVD GT
    assert mk("ar", "train").flip is True
    assert mk("ar", "test").flip is False


def test_sampling_clip_mode(ucf_tree):
    """sampling='clip' (documented reference-parity mode) must exist and
    yield a uniform clip permutation instead of the video-grouped order."""
    data_dir, label_dir = ucf_tree
    ds = UCF101Dataset(data_dir, label_dir, frames_per_clip=4, train=True,
                       frame_rate=6, frame_size=32, sampling="clip")
    order = ds.epoch_order(np.random.default_rng(0))
    assert sorted(order.tolist()) == list(range(len(ds)))
    grouped = UCF101Dataset(data_dir, label_dir, frames_per_clip=4,
                            train=True, frame_rate=6, frame_size=32)
    gorder = grouped.epoch_order(np.random.default_rng(0))
    assert sorted(gorder.tolist()) == list(range(len(grouped)))
    assert order.tolist() != gorder.tolist()
