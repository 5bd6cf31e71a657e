"""Native C++ fastloader: build, batch correctness, sampling, augmentation."""

import numpy as np
import pytest

from sd_video_gen_tpu.data import generate_bouncing_ball_tree, BouncingBallDataset
from sd_video_gen_tpu.data.native_loader import (build_frame_cache,
                                                 NativeBatchLoader, _load_lib)


@pytest.fixture(scope="module")
def cache(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    root = generate_bouncing_ball_tree(str(tmp / "d"), 4, 0, 10, 32)
    ds = BouncingBallDataset(5, 1, root, "train", shuffle=False)
    build_frame_cache(ds, str(tmp / "cache"), "train")
    return str(tmp / "cache"), ds


def test_lib_builds():
    lib = _load_lib()
    assert lib is not None


def test_batches_match_dataset(cache):
    cache_dir, ds = cache
    loader = NativeBatchLoader(cache_dir, "train", batch_size=2,
                               shuffle=False, n_threads=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 4  # 8 clips / 2
    seen = 0
    for idx, frames in batches:
        assert frames.shape == (2, 5, 32, 32, 3)
        for j, clip_id in enumerate(idx):
            _, ref = ds[clip_id]
            np.testing.assert_array_equal(frames[j], ref)
            seen += 1
    assert seen == 8
    loader.close()


def test_shuffle_and_epoch_ratio(cache):
    cache_dir, _ = cache
    loader = NativeBatchLoader(cache_dir, "train", batch_size=2,
                               epoch_ratio=0.5, shuffle=True, seed=3)
    b1 = list(loader)
    assert len(b1) == 2  # 4 clips / 2
    ids1 = [i for idx, _ in b1 for i in idx]
    b2 = list(loader)
    ids2 = [i for idx, _ in b2 for i in idx]
    assert sorted(ids1) != sorted(ids2) or ids1 != ids2  # reshuffles epochs
    loader.close()


def test_flip_augmentation(cache):
    cache_dir, ds = cache
    loader = NativeBatchLoader(cache_dir, "train", batch_size=8,
                               shuffle=False, flip=True, seed=0)
    idx, frames = next(iter(loader))
    flipped = straight = 0
    for j, clip_id in enumerate(idx):
        _, ref = ds[clip_id]
        if (frames[j] == ref).all():
            straight += 1
        elif (frames[j] == ref[:, :, ::-1]).all():
            flipped += 1
    assert flipped + straight == len(idx)
    assert flipped >= 1 and straight >= 1  # coin actually flips
    loader.close()


def test_latent_records_flat(cache, tmp_path):
    """f32 flat records (latent cache) load without augmentation."""
    lat = np.random.default_rng(0).standard_normal((6, 5, 64)).astype(np.float32)

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return [i], lat[i]

    build_frame_cache(DS(), str(tmp_path), "train")
    loader = NativeBatchLoader(str(tmp_path), "train", batch_size=3,
                               shuffle=False)
    batches = list(loader)
    assert len(batches) == 2
    np.testing.assert_array_equal(batches[0][1], lat[:3])
    loader.close()
