"""End-to-end training smoke: bouncing ball, pixel codec, CPU (SURVEY.md §4d),
plus train-step semantics for the diff/future strategy modes."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.config import Config
from sd_video_gen_tpu.data import (BouncingBallDataset, BatchLoader,
                                   generate_bouncing_ball_tree)
from sd_video_gen_tpu.train.trainer import Trainer, make_train_step
from sd_video_gen_tpu.codecs import PixelCodec
from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.ops import LossWeights
from sd_video_gen_tpu.parallel import make_mesh


def _tiny_cfg(**kw):
    d = dict(config_name="tiny", lr=1e-3, batch_size=2, epochs=2,
             frames_per_clip=5, frames_to_predict=2, frame_size=32,
             dim_model=32, num_heads=4, num_encoder_layers=1,
             num_decoder_layers=1, dropout_p=0.0,
             use_mse=True, use_gdl=True, lambda_gdl=1.0, alpha=1.0,
             use_contrastive=False)
    d.update(kw)
    return Config(**d)


def test_train_e2e_loss_decreases(tmp_path):
    root = generate_bouncing_ball_tree(str(tmp_path / "data"), n_train_seqs=3,
                                       n_test_seqs=1, frames_per_seq=10,
                                       size=32)
    cfg = _tiny_cfg()
    mesh = make_mesh("data=1,model=1", devices=jax.devices()[:1])
    trainer = Trainer(cfg, mode="ar", codec_kind="pixel", mesh=mesh,
                      checkpoint_dir=str(tmp_path / "ckpt"), use_wandb=False)
    tr = BatchLoader(BouncingBallDataset(5, 1, root, "train"), 2, seed=1)
    va = BatchLoader(BouncingBallDataset(5, 1, root, "test"), 2, seed=1)
    hist = trainer.fit(tr, va, epochs=3, save_best=False)
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    # checkpoint written with reference naming
    assert os.path.isdir(tmp_path / "ckpt" / "tiny_0_test")


def test_checkpoint_roundtrip(tmp_path):
    root = generate_bouncing_ball_tree(str(tmp_path / "data"), n_train_seqs=2,
                                       n_test_seqs=1, frames_per_seq=10,
                                       size=32)
    cfg = _tiny_cfg()
    mesh = make_mesh("data=1,model=1", devices=jax.devices()[:1])
    t1 = Trainer(cfg, mode="ar", mesh=mesh,
                 checkpoint_dir=str(tmp_path / "ckpt"), use_wandb=False)
    tr = BatchLoader(BouncingBallDataset(5, 1, root, "train"), 2, seed=1)
    t1.fit(tr, tr, epochs=1)
    saved_params = jax.tree.leaves(t1.state.params)

    t2 = Trainer(cfg, mode="ar", mesh=mesh,
                 checkpoint_dir=str(tmp_path / "ckpt2"), use_wandb=False)
    _, frames = next(iter(tr))
    t2.init_state(frames)
    t2.resume(os.path.join("..", "ckpt", "tiny_0_test"))
    restored = jax.tree.leaves(t2.state.params)
    for a, b in zip(saved_params, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(t2.state.step) == int(t1.state.step)


def test_diff_mode_residual_semantics(rng):
    """diff mode: pred for last k positions gets previous-frame latents added
    (trainers/trainer_diff.py:140-142)."""
    cfg = _tiny_cfg()
    codec = PixelCodec(cfg.frame_size)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=32,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0)
    model = FrameTransformer(mc)
    w = LossWeights(use_mse=True, use_gdl=False, use_contrastive=False)
    frames = jnp.asarray(
        rng.integers(0, 255, (2, 5, 32, 32, 3)).astype(np.uint8))

    from sd_video_gen_tpu.train.trainer import _predictions_and_targets
    latents = codec.encode_batch(frames, use_sos=True)
    params = model.init(jax.random.PRNGKey(0), latents, latents[:, :-1])
    k = cfg.frames_to_predict
    p_ar, t_ar = _predictions_and_targets(model, params, latents, k, "ar",
                                          None, deterministic=True)
    p_diff, t_diff = _predictions_and_targets(model, params, latents, k, "diff",
                                              None, deterministic=True)
    np.testing.assert_array_equal(np.asarray(t_ar), np.asarray(t_diff))
    expect = np.asarray(p_ar) + np.asarray(latents[:, -(k + 1):-1])
    np.testing.assert_allclose(np.asarray(p_diff), expect, rtol=1e-5)


def test_future_mode_shapes(rng):
    cfg = _tiny_cfg(frames_per_clip=4, frames_to_predict=2)
    codec = PixelCodec(cfg.frame_size)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=32,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0,
                                mode="future", frames_to_predict=2)
    model = FrameTransformer(mc)
    w = LossWeights(use_mse=True, use_gdl=False, use_contrastive=False)
    init_fn, step_fn = make_train_step(model, codec, w, cfg, mode="future",
                                       lr=1e-3)
    # future mode: clip length = frames_per_clip + frames_to_predict, no SOS
    frames = jnp.asarray(
        rng.integers(0, 255, (2, 6, 32, 32, 3)).astype(np.uint8))
    state = init_fn(jax.random.PRNGKey(0), frames)
    state, comps = step_fn(state, frames, jax.random.PRNGKey(1))
    assert np.isfinite(float(comps["total"]))


def test_learned_tgt_mode_trains(rng):
    """learned_tgt (DETR-style queries) is now reachable from the trainer:
    future split, model ignores tgt and emits exactly k query outputs."""
    cfg = _tiny_cfg(frames_per_clip=4, frames_to_predict=2)
    codec = PixelCodec(cfg.frame_size)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=32,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0,
                                mode="learned_tgt", frames_to_predict=2)
    model = FrameTransformer(mc)
    w = LossWeights(use_mse=True, use_gdl=False, use_contrastive=False)
    init_fn, step_fn = make_train_step(model, codec, w, cfg,
                                       mode="learned_tgt", lr=1e-2)
    frames = jnp.asarray(
        rng.integers(0, 255, (2, 6, 32, 32, 3)).astype(np.uint8))
    state = init_fn(jax.random.PRNGKey(0), frames)
    flat = {"/".join(str(k) for k in path): v for path, v in
            jax.tree_util.tree_flatten_with_path(state.params)[0]}
    assert any("query_pos" in k for k in flat)
    first = None
    for i in range(8):
        state, comps = step_fn(state, frames, jax.random.PRNGKey(1))
        total = float(comps["total"])
        assert np.isfinite(total)
        first = first if first is not None else total
    assert total < first


def test_default_mesh_warns_on_idle_devices():
    import warnings
    from sd_video_gen_tpu.parallel.mesh import default_mesh_for_batch
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        mesh = default_mesh_for_batch(6)  # gcd(6, 8) = 2 -> 6 devices idle
    assert mesh.devices.size == 2
    assert any("IDLE" in str(w.message) for w in rec)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        mesh = default_mesh_for_batch(8)
    assert mesh.devices.size == 8
    assert not rec


def test_precision_bf16_variants(tmp_path):
    """--precision bf16 keeps f32 master params with bf16 compute;
    bf16_full stores bf16 params + bf16 Adam mu. Both must train."""
    root = generate_bouncing_ball_tree(str(tmp_path / "data"), n_train_seqs=3,
                                       n_test_seqs=1, frames_per_seq=10,
                                       size=32)
    mesh = make_mesh("data=1,model=1", devices=jax.devices()[:1])
    tr = BatchLoader(BouncingBallDataset(5, 1, root, "train", seed=1), 2,
                     seed=1)

    for precision, pdtype, mudtype in (("bf16", jnp.float32, jnp.float32),
                                       ("bf16_full", jnp.bfloat16,
                                        jnp.bfloat16)):
        t = Trainer(_tiny_cfg(), mode="ar", mesh=mesh,
                    checkpoint_dir=str(tmp_path / f"ck_{precision}"),
                    use_wandb=False, precision=precision)
        hist = t.fit(tr, tr, epochs=3)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"], precision
        kern = t.state.params["params"]["embedding"]["kernel"]
        assert kern.dtype == pdtype, precision
        mu = t.state.opt_state[0].mu["params"]["embedding"]["kernel"]
        assert mu.dtype == mudtype, precision
        # losses are finite and f32 regardless of compute dtype
        assert np.isfinite(hist[-1]["train_loss"])


def test_save_best_not_gated_by_ckpt_every(tmp_path, monkeypatch):
    """--save_best must see EVERY epoch's metrics: gating it on --ckpt_every
    would let the true best epoch pass unsaved and a later, worse epoch
    claim the 'best' checkpoint."""
    root = generate_bouncing_ball_tree(str(tmp_path / "data"), n_train_seqs=2,
                                       n_test_seqs=1, frames_per_seq=10,
                                       size=32)
    cfg = _tiny_cfg()
    mesh = make_mesh("data=1,model=1", devices=jax.devices()[:1])
    trainer = Trainer(cfg, mode="ar", mesh=mesh,
                      checkpoint_dir=str(tmp_path / "ckpt"), use_wandb=False)
    tr = BatchLoader(BouncingBallDataset(5, 1, root, "train"), 2, seed=1)

    calls = []
    monkeypatch.setattr(trainer, "_save",
                        lambda metrics, save_best: calls.append(save_best))
    trainer.fit(tr, tr, epochs=3, save_best=True, ckpt_every=5)
    assert len(calls) == 3  # every epoch, despite ckpt_every=5

    # save-last mode stays rate-limited: only the final epoch saves
    calls.clear()
    trainer.state = None
    trainer.fit(tr, tr, epochs=3, save_best=False, ckpt_every=5)
    assert len(calls) == 1


def test_build_dataset_extends_future_modes(tmp_path):
    """future/learned_tgt need clips of fpc + frames_to_predict for every
    dataset — ball/mnist previously produced EMPTY encoder inputs at the
    default fpc == frames_to_predict (review regression)."""
    from types import SimpleNamespace

    from sd_video_gen_tpu.train.trainer import build_dataset

    root = generate_bouncing_ball_tree(str(tmp_path / "d"), 2, 1, 16, 32)
    cfg = _tiny_cfg(frames_per_clip=5, frames_to_predict=3)
    mk = lambda mode, exact=None: build_dataset(
        cfg, SimpleNamespace(dataset="ball", folder=root, seed=0,
                             train_mode=mode), "train", exact_frames=exact)
    assert mk("ar")[0][1].shape[0] == 5
    assert mk("future")[0][1].shape[0] == 8
    assert mk("learned_tgt")[0][1].shape[0] == 8
    assert mk("future", exact=6)[0][1].shape[0] == 6  # eval override wins


def test_empty_val_epoch_does_not_crown_best(tmp_path, monkeypatch):
    """An empty validation epoch must not report val_loss=0.0 — under
    save_best that pinned best_val to 0.0 forever (review regression)."""
    root = generate_bouncing_ball_tree(str(tmp_path / "data"), 2, 1, 10, 32)
    cfg = _tiny_cfg(epochs=1)
    mesh = make_mesh("data=1,model=1", devices=jax.devices()[:1])
    trainer = Trainer(cfg, mode="ar", mesh=mesh,
                      checkpoint_dir=str(tmp_path / "ckpt"), use_wandb=False)
    tr = BatchLoader(BouncingBallDataset(5, 1, root, "train"), 2, seed=1)

    class EmptyLoader:
        def __len__(self):
            return 0

        def __iter__(self):
            return iter(())

    saved = []
    monkeypatch.setattr(trainer, "_save",
                        lambda m, b: saved.append(m["val_loss"]))
    hist = trainer.fit(tr, EmptyLoader(), epochs=1, save_best=True)
    assert np.isnan(hist[-1]["val_loss"])
    assert trainer.best_val == float("inf")  # nan never crowned a best
