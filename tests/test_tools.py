"""Tools/utilities: format_data split, latent cache round trip, FILM regroup,
TF-I3D name map, text-embed helpers."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.utils.format_data import split_dataset
from sd_video_gen_tpu.utils.preprocess import build_latent_cache
from sd_video_gen_tpu.data.latent_cache import LatentCacheDataset
from sd_video_gen_tpu.data import (BouncingBallDataset,
                                   generate_bouncing_ball_tree)
from sd_video_gen_tpu.codecs import PixelCodec
from sd_video_gen_tpu.predict.run_frame_interpolation import regroup_outputs
from sd_video_gen_tpu.models.text_embed import (ClassNameEmbedder,
                                                split_class_name)


def test_format_data_split(tmp_path):
    for i in range(10):
        (tmp_path / f"{i:04d}").mkdir()
    tr, te = split_dataset(str(tmp_path), ratio=0.8)
    assert tr == 8 and te == 2
    assert len(os.listdir(tmp_path / "train")) == 8
    assert len(os.listdir(tmp_path / "test")) == 2


def test_latent_cache_roundtrip_and_training(tmp_path):
    root = generate_bouncing_ball_tree(str(tmp_path / "d"), 2, 1, 10, 32)
    ds = BouncingBallDataset(5, 1, root, "train", shuffle=False)
    codec = PixelCodec(32)
    path = build_latent_cache(ds, codec, str(tmp_path / "cache"), "train",
                              batch=3)
    cache = LatentCacheDataset(str(tmp_path / "cache"), "train")
    assert len(cache) == len(ds)
    idx, lat = cache[0]
    assert lat.shape == (5, codec.latent_dim)
    # cached latents == on-the-fly encode
    _, frames = ds[0]
    direct = np.asarray(codec.encode_frames(jnp.asarray(frames)[None]))[0]
    np.testing.assert_allclose(lat, direct, atol=1e-6)

    # trainer passthrough treats (B,T,L) as latents
    from sd_video_gen_tpu.train.trainer import encode_or_passthrough
    batch = jnp.asarray(np.stack([cache[i][1] for i in range(2)]))
    out = encode_or_passthrough(codec, batch, use_sos=True)
    assert out.shape == (2, 6, codec.latent_dim)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), 2.0)


def test_film_regroup(tmp_path):
    import cv2
    for n in range(2):
        d = tmp_path / "outputs" / str(n)
        d.mkdir(parents=True)
        for i in range(13):
            cv2.imwrite(str(d / f"{i}.png"),
                        np.zeros((8, 8, 3), np.uint8))
    groups = regroup_outputs(str(tmp_path / "outputs"), str(tmp_path / "work"),
                             start=8, end=12)
    assert len(groups) == 2
    assert len(os.listdir(groups[0])) == 5  # frames 8..12


def test_tf_i3d_var_map_complete():
    from tools.convert_tf_i3d import tf_var_map
    m = tf_var_map()
    # 3 stem convs * 5 entries + 9 mixed * 6 branches * 5 + logits (2)
    assert len(m) == 3 * 5 + 9 * 6 * 5 + 2
    assert m["Conv3d_1a_7x7/conv3d/kernel"][0] == \
        "RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w"
    assert m["Mixed_4f/b3b/bn_mean"][0] == \
        "RGB/inception_i3d/Mixed_4f/Branch_3/Conv3d_0b_1x1/batch_norm/moving_mean"
    assert m["logits/conv3d/bias"][0] == \
        "RGB/inception_i3d/Logits/Conv3d_0c_1x1/conv_3d/b"


def test_split_class_name():
    assert split_class_name("WallPushups") == "Wall Pushups"
    assert split_class_name("YoYo") == "Yo Yo"
    assert split_class_name("PlayingDaf") == "Playing Daf"


def test_class_embedder_table_and_npy(tmp_path):
    table = np.random.default_rng(0).standard_normal((5, 384)).astype(np.float32)
    p = tmp_path / "emb.npy"
    np.save(p, table)
    emb = ClassNameEmbedder.from_npy(str(p))
    out = emb(jnp.asarray([0, 3], jnp.int32))
    np.testing.assert_allclose(np.asarray(out), table[[0, 3]], atol=1e-6)
    # deterministic fallback: same name -> same embedding
    a = ClassNameEmbedder(3, 8, names=["Foo", "Bar", "Baz"])
    b = ClassNameEmbedder(3, 8, names=["Foo", "Bar", "Baz"])
    np.testing.assert_array_equal(np.asarray(a.table), np.asarray(b.table))
