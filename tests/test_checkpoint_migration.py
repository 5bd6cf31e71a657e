"""Checkpoint schema versioning + v1 migration.

r2 added the transformer's final stack norms (enc_norm/dec_norm — torch
nn.Transformer parity), changing the param tree: checkpoints saved before
that (format v1, unstamped) used to fail restore with a structure mismatch.
``restore_checkpoint`` now migrates them: missing LayerNorms initialize to
scale=1/bias=0 with fresh Adam moments, with a warning.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import orbax.checkpoint as ocp

from sd_video_gen_tpu.config import Config
from sd_video_gen_tpu.codecs import PixelCodec
from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.ops import LossWeights
from sd_video_gen_tpu.train import checkpoint as ckpt
from sd_video_gen_tpu.train.trainer import make_train_step


def _tiny_state():
    cfg = Config(config_name="tiny", lr=1e-3, batch_size=2,
                 frames_per_clip=5, frames_to_predict=2, frame_size=16,
                 dim_model=32, num_heads=4, num_encoder_layers=1,
                 num_decoder_layers=1, dropout_p=0.0, use_mse=True)
    codec = PixelCodec(cfg.frame_size)
    model = FrameTransformer(FrameTransformerConfig(
        latent_dim=codec.latent_dim, dim_model=32, num_heads=4,
        num_encoder_layers=1, num_decoder_layers=1, dropout_p=0.0))
    init_fn, step_fn = make_train_step(model, codec,
                                       LossWeights.from_config(cfg), cfg)
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 7, 16, 16, 3)).astype(np.uint8)
    state = init_fn(jax.random.PRNGKey(0), jnp.asarray(frames))
    # take one real step so opt state / step are non-trivial
    state, _ = step_fn(state, jnp.asarray(frames), jax.random.PRNGKey(1))
    return state


def test_save_stamps_format_version(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, state)
    assert ckpt.read_format_version(path) == ckpt.FORMAT_VERSION
    restored = ckpt.restore_checkpoint(path, ckpt.abstract_like(state))
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unstamped_current_structure_restores_without_migration(tmp_path):
    """Early-v2 checkpoints (current tree, no stamp) restore normally."""
    state = _tiny_state()
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, state)
    os.remove(os.path.join(path, "sdvg_format.json"))
    assert ckpt.read_format_version(path) == 1
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no migration warning expected
        restored = ckpt.restore_checkpoint(path, ckpt.abstract_like(state))
    np.testing.assert_array_equal(np.asarray(restored.step),
                                  np.asarray(state.step))


def test_v1_checkpoint_migrates_with_identity_norms(tmp_path):
    state = _tiny_state()
    # synthesize the v1 on-disk format: same TrainState minus
    # enc_norm/dec_norm in params AND in the Adam moments, no stamp
    v1_state = state.replace(params=ckpt._strip(state.params),
                             opt_state=ckpt._strip(state.opt_state))
    path = str(tmp_path / "old")
    with ocp.StandardCheckpointer() as c:
        c.save(path, v1_state, force=True)

    with pytest.warns(UserWarning, match="format v1"):
        restored = ckpt.restore_checkpoint(os.path.abspath(path),
                                           ckpt.abstract_like(state))

    p = restored.params["params"]
    np.testing.assert_array_equal(np.asarray(p["enc_norm"]["scale"]), 1.0)
    np.testing.assert_array_equal(np.asarray(p["enc_norm"]["bias"]), 0.0)
    np.testing.assert_array_equal(np.asarray(p["dec_norm"]["scale"]), 1.0)
    # carried-over params survive bit-exactly
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["embedding"]["kernel"]),
        np.asarray(state.params["params"]["embedding"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(restored.step),
                                  np.asarray(state.step))
    # fresh (zero) moments for the filled-in norms
    mu = restored.opt_state[0].mu["params"]
    np.testing.assert_array_equal(np.asarray(mu["enc_norm"]["scale"]), 0.0)
    # existing moments carried over
    np.testing.assert_array_equal(
        np.asarray(restored.opt_state[0].mu["params"]["embedding"]["kernel"]),
        np.asarray(state.opt_state[0].mu["params"]["embedding"]["kernel"]))


def test_missing_path_raises_filenotfound(tmp_path):
    state = _tiny_state()
    with pytest.raises(FileNotFoundError):
        ckpt.restore_checkpoint(str(tmp_path / "nope"),
                                ckpt.abstract_like(state))


def test_wrong_structure_surfaces_original_error(tmp_path):
    """An unstamped checkpoint that is NOT v1 (e.g. saved under a different
    --config) must raise the real structure error — not emit a misleading
    'format v1 ... migrating' warning on the way to a second failure."""
    import warnings as _w
    state = _tiny_state()
    # save a checkpoint of a genuinely different model (dim 64 vs 32)
    cfg = Config(config_name="wide", lr=1e-3, batch_size=2,
                 frames_per_clip=5, frames_to_predict=2, frame_size=16,
                 dim_model=64, num_heads=4, num_encoder_layers=2,
                 num_decoder_layers=2, dropout_p=0.0, use_mse=True)
    codec = PixelCodec(cfg.frame_size)
    model = FrameTransformer(FrameTransformerConfig(
        latent_dim=codec.latent_dim, dim_model=64, num_heads=4,
        num_encoder_layers=2, num_decoder_layers=2, dropout_p=0.0))
    init_fn, _ = make_train_step(model, codec, LossWeights.from_config(cfg),
                                 cfg)
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 7, 16, 16, 3)).astype(np.uint8)
    other = init_fn(jax.random.PRNGKey(0), jnp.asarray(frames))
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, other)
    os.remove(os.path.join(path, "sdvg_format.json"))  # make it unstamped

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        with pytest.raises(Exception) as ei:
            ckpt.restore_checkpoint(path, ckpt.abstract_like(state))
    assert not any("format v1" in str(r.message) for r in rec), \
        "misleading v1-migration warning fired for a non-v1 checkpoint"
    assert "v1" not in str(ei.value)


def test_async_save_stamps_and_restores(tmp_path):
    """block=False returns before the write commits; finalize_saves() makes
    it durable + stamped, and restore never reads an in-flight save."""
    state = _tiny_state()
    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    ckpt.save_checkpoint(p1, state, block=False)
    ckpt.save_checkpoint(p2, state, block=False)  # sequences behind p1
    restored = ckpt.restore_checkpoint(p1, ckpt.abstract_like(state))
    assert ckpt.read_format_version(p1) == ckpt.FORMAT_VERSION
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["embedding"]["kernel"]),
        np.asarray(state.params["params"]["embedding"]["kernel"]))
    ckpt.finalize_saves()
    assert ckpt.read_format_version(p2) == ckpt.FORMAT_VERSION


def test_async_resave_same_path(tmp_path):
    """Re-saving a path whose first save is still pending must not stamp a
    half-written directory; the final contents win."""
    state = _tiny_state()
    bumped = state.replace(step=state.step + 41)
    p = str(tmp_path / "ck")
    ckpt.save_checkpoint(p, state, block=False)
    ckpt.save_checkpoint(p, bumped, block=False)
    ckpt.finalize_saves()
    restored = ckpt.restore_checkpoint(p, ckpt.abstract_like(state))
    assert int(restored.step) == int(bumped.step)
    assert ckpt.read_format_version(p) == ckpt.FORMAT_VERSION
