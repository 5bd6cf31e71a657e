"""Data layer: synthetic tree generation, clip indexing, batch loading, codec."""

import numpy as np
import jax.numpy as jnp

from sd_video_gen_tpu.data import (BouncingBallDataset, BatchLoader,
                                   generate_bouncing_ball_tree)
from sd_video_gen_tpu.data.frame_datasets import MovingMNISTDataset
from sd_video_gen_tpu.codecs import PixelCodec, add_sos, SOS_VALUE


def test_synthetic_tree_and_loader(tmp_path):
    root = generate_bouncing_ball_tree(str(tmp_path), n_train_seqs=3,
                                       n_test_seqs=1, frames_per_seq=10,
                                       size=32)
    ds = BouncingBallDataset(num_frames=5, stride=1, dir=root, stage="train",
                             shuffle=False)
    # 3 seqs * 10 frames // 5 per clip = 6 clips
    assert len(ds) == 6
    idx, frames = ds[0]
    assert frames.shape == (5, 32, 32, 3)
    assert frames.dtype == np.uint8
    assert len(idx) == 5
    # clip indices are consecutive within one parent
    assert idx[1] - idx[0] == 1


def test_clips_respect_parent_boundary(tmp_path):
    root = generate_bouncing_ball_tree(str(tmp_path), n_train_seqs=2,
                                       n_test_seqs=0, frames_per_seq=7,
                                       size=32)
    # 7 frames per seq, clips of 5: frames 5..6 + next seq would cross parents
    ds = BouncingBallDataset(num_frames=5, stride=1, dir=root, stage="train",
                             shuffle=False)
    for idx in ds.indices:
        parents = {i // 1000 for i in idx}
        assert len(parents) == 1


def test_stride_clip_indexing(tmp_path):
    root = generate_bouncing_ball_tree(str(tmp_path), n_train_seqs=1,
                                       n_test_seqs=0, frames_per_seq=10,
                                       size=32)
    ds = BouncingBallDataset(num_frames=3, stride=2, dir=root, stage="train",
                             shuffle=False)
    idx = ds.indices[0]
    assert idx[1] - idx[0] == 2 and idx[2] - idx[1] == 2


def test_batch_loader_shapes_and_ratio(tmp_path):
    root = generate_bouncing_ball_tree(str(tmp_path), n_train_seqs=4,
                                       n_test_seqs=0, frames_per_seq=10,
                                       size=32)
    ds = BouncingBallDataset(num_frames=5, stride=1, dir=root, stage="train")
    loader = BatchLoader(ds, batch_size=2, epoch_ratio=1.0, prefetch=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 4  # 8 clips / 2
    _, frames = batches[0]
    assert frames.shape == (2, 5, 32, 32, 3)
    half = BatchLoader(ds, batch_size=2, epoch_ratio=0.5)
    assert len(list(half)) == 2


def test_moving_mnist(tmp_path):
    arr = np.random.default_rng(0).integers(0, 255, (20, 10, 64, 64),
                                            dtype=np.uint8)
    p = tmp_path / "mnist_test_seq.npy"
    np.save(p, arr)
    tr = MovingMNISTDataset(num_frames=5, stride=1, path=str(p), stage="train",
                            shuffle=False)
    te = MovingMNISTDataset(num_frames=5, stride=1, path=str(p), stage="test",
                            shuffle=False)
    assert len(tr) == 8 and len(te) == 2  # 80/20 split
    ids, frames = tr[0]
    assert frames.shape == (5, 64, 64, 3)
    # grayscale stacked to 3 identical channels
    np.testing.assert_array_equal(frames[..., 0], frames[..., 1])


def test_pixel_codec_roundtrip(rng):
    codec = PixelCodec(frame_size=64)
    frames = rng.integers(0, 255, (2, 3, 64, 64, 3)).astype(np.uint8)
    lat = codec.encode_frames(jnp.asarray(frames))
    assert lat.shape == (2, 3, codec.latent_dim)
    dec = codec.decode_latents(lat.reshape(-1, codec.latent_dim))
    assert dec.shape == (6, 64, 64, 3) and dec.dtype == np.uint8
    # smooth content survives the round trip approximately
    smooth = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None],
                     (64, 1, 3))[None, None]
    sm = np.repeat(np.repeat(smooth, 2, 0), 3, 1)
    lat2 = codec.encode_frames(jnp.asarray(sm))
    dec2 = np.asarray(codec.decode_latents(lat2.reshape(-1, codec.latent_dim)))
    assert np.abs(dec2.astype(int) - sm.reshape(-1, 64, 64, 3).astype(int)).mean() < 10


def test_sos_token():
    lat = jnp.zeros((2, 5, 16))
    with_sos = add_sos(lat)
    assert with_sos.shape == (2, 6, 16)
    np.testing.assert_array_equal(np.asarray(with_sos[:, 0]),
                                  np.full((2, 16), SOS_VALUE))


def test_kitti_center_crop(tmp_path):
    """KITTI per-frame transform: center square crop + resize
    (loaders/kitti_loader.py:89-100 semantics)."""
    import cv2
    from sd_video_gen_tpu.data import KittiDataset
    d = tmp_path / "train" / "0001"
    d.mkdir(parents=True)
    # wide image: left third black, middle third gray, right third white
    img = np.zeros((30, 90, 3), np.uint8)
    img[:, 30:60] = 128
    img[:, 60:] = 255
    for t in range(3):
        cv2.imwrite(str(d / f"0001{t:03d}.png"), img)
    ds = KittiDataset(num_frames=3, stride=1, dir=str(tmp_path),
                      stage="train", shuffle=False, frame_size=16)
    _, frames = ds[0]
    assert frames.shape == (3, 16, 16, 3)
    # center square of a 30x90 image is the gray middle band
    assert abs(int(frames[0, 8, 8, 0]) - 128) <= 1


def test_batchloader_rejects_unshardable_batch_size():
    """A global batch that cannot shard evenly over the mesh requirement
    must be refused loudly, not trimmed silently (trimming a FULL batch
    drops clips; batch_size < shard_multiple would yield empty epochs)."""
    import pytest
    ds = [(i, np.zeros((5, 4, 4, 3), np.uint8)) for i in range(20)]
    with pytest.raises(ValueError, match="multiple of shard_multiple"):
        BatchLoader(ds, 6, process_shard=(0, 2), shard_multiple=8, seed=0)
    # divisible: fine
    BatchLoader(ds, 8, process_shard=(0, 2), shard_multiple=8, seed=0)


def test_batchloader_rejects_mult_not_multiple_of_procs():
    """shard_multiple must itself divide evenly across processes: a ragged
    tail trims to a multiple of shard_multiple then splits per-process, so
    e.g. mult=3 over 2 procs would yield a trimmed GLOBAL tail of 2 — no
    longer shardable over the mesh (the trainer passes lcm(data, procs))."""
    import pytest
    ds = [(i, np.zeros((5, 4, 4, 3), np.uint8)) for i in range(20)]
    with pytest.raises(ValueError, match="multiple of the process count"):
        BatchLoader(ds, 6, process_shard=(0, 2), shard_multiple=3, seed=0)
    from sd_video_gen_tpu.data.native_loader import NativeBatchLoader
    import json as _json
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        with open(f"{d}/train.json", "w") as f:
            _json.dump({"n_clips": 4, "shape": [5, 4, 4, 3],
                        "dtype": "uint8"}, f)
        open(f"{d}/train.bin", "wb").write(bytes(4 * 5 * 4 * 4 * 3))
        with pytest.raises(ValueError, match="multiple of the process count"):
            NativeBatchLoader(d, "train", 6, process_shard=(0, 2),
                              shard_multiple=3, seed=0)


def test_batchloader_len_matches_iter_under_sharding():
    """len(loader) must count exactly the batches __iter__ yields,
    including the ragged short-batch trim rule."""
    ds = [(i, np.zeros((5, 4, 4, 3), np.uint8)) for i in range(5)]
    # 5 clips, batch 8 (> dataset): short batch of 5 trims to 4 (mult 4)
    ld = BatchLoader(ds, 8, process_shard=(0, 2), shard_multiple=4, seed=0)
    batches = list(ld)
    assert len(ld) == len(batches) == 1
    assert batches[0][1].shape[0] == 2  # local slice: 4 global / 2 procs
    # 3 clips, mult 4: trims to zero -> empty epoch, len agrees
    ld = BatchLoader(ds[:3], 8, process_shard=(0, 2), shard_multiple=4,
                     seed=0)
    assert len(ld) == len(list(ld)) == 0
    # unsharded short batch unchanged: one short batch
    ld = BatchLoader(ds[:3], 8, seed=0)
    assert len(ld) == len(list(ld)) == 1


def test_batchloader_single_host_ragged_trim():
    """shard_multiple must bite WITHOUT process_shard too: a single-host
    ragged batch that doesn't divide the mesh data axis would crash
    device_put (review regression)."""
    ds = [(i, np.zeros((5, 4, 4, 3), np.uint8)) for i in range(6)]
    ld = BatchLoader(ds, 4, shard_multiple=2, seed=0, drop_last=False)
    batches = list(ld)
    assert len(ld) == len(batches) == 2
    assert batches[0][1].shape[0] == 4
    assert batches[1][1].shape[0] == 2   # ragged 2 stays (divides mult)
    # ragged 1 trims to zero -> batch dropped, len agrees
    ld = BatchLoader(ds[:5], 4, shard_multiple=2, seed=0, drop_last=False)
    batches = list(ld)
    assert len(ld) == len(batches) == 1
    assert batches[0][1].shape[0] == 4
    # batch_size itself must divide the multiple
    import pytest
    with pytest.raises(ValueError, match="multiple of shard_multiple"):
        BatchLoader(ds, 5, shard_multiple=2, seed=0)


def test_build_clips_stride_trailing(tmp_path):
    """stride>1: the last clip only needs (num_frames-1)*stride+1 entries —
    the full-span bound dropped valid trailing clips (review regression)."""
    from sd_video_gen_tpu.data.synthetic import generate_bouncing_ball_tree

    root = generate_bouncing_ball_tree(str(tmp_path / "d"), 1, 0, 9, 16)
    ds = BouncingBallDataset(num_frames=5, stride=2, dir=root, stage="train",
                             seed=0)
    assert len(ds) == 1  # frames 0,2,4,6,8 form one complete strided clip
    assert ds[0][1].shape == (5, 16, 16, 3)


def test_mnist_refuses_truncation(tmp_path):
    import pytest

    from sd_video_gen_tpu.data.frame_datasets import MovingMNISTDataset

    arr = np.zeros((20, 4, 32, 32), np.uint8)
    p = tmp_path / "mnist_test_seq.npy"
    np.save(p, arr)
    with pytest.raises(ValueError, match="needs"):
        MovingMNISTDataset(num_frames=25, path=str(p), stage="train")
    with pytest.raises(ValueError, match="needs"):
        MovingMNISTDataset(num_frames=15, stride=2, path=str(p),
                           stage="train")
    MovingMNISTDataset(num_frames=10, stride=2, path=str(p), stage="train")
