"""Failure/preemption handling: interrupt checkpoint + exact resume."""

import os

import numpy as np
import jax
import pytest

from sd_video_gen_tpu.config import Config
from sd_video_gen_tpu.data import (BouncingBallDataset, BatchLoader,
                                   generate_bouncing_ball_tree)
from sd_video_gen_tpu.train.trainer import Trainer
from sd_video_gen_tpu.parallel import make_mesh


class _Boom(RuntimeError):
    pass


def _cfg():
    return Config(config_name="tiny", lr=1e-3, batch_size=2, epochs=5,
                  frames_per_clip=5, frames_to_predict=2, frame_size=32,
                  dim_model=32, num_heads=4, num_encoder_layers=1,
                  num_decoder_layers=1, dropout_p=0.0, use_contrastive=False)


def test_interrupt_checkpoint_and_resume(tmp_path):
    root = generate_bouncing_ball_tree(str(tmp_path / "d"), 3, 1, 10, 32)
    mesh = make_mesh("data=1,model=1", devices=jax.devices()[:1])
    tr = BatchLoader(BouncingBallDataset(5, 1, root, "train"), 2, seed=1)

    t1 = Trainer(_cfg(), mode="ar", mesh=mesh,
                 checkpoint_dir=str(tmp_path / "ckpt"), use_wandb=False)

    # crash mid-training after 2 epochs
    calls = {"n": 0}
    orig = t1.validation_loop

    def exploding_val(loader):
        calls["n"] += 1
        if calls["n"] == 3:
            raise _Boom("preempted")
        return orig(loader)

    t1.validation_loop = exploding_val
    with pytest.raises(_Boom):
        t1.fit(tr, tr, epochs=5)
    assert os.path.isdir(tmp_path / "ckpt" / "tiny_0_interrupt")
    step_at_crash = int(t1.state.step)
    params_at_crash = jax.tree.leaves(t1.state.params)

    # resume restores params AND optimizer state at the exact step
    t2 = Trainer(_cfg(), mode="ar", mesh=mesh,
                 checkpoint_dir=str(tmp_path / "ckpt2"), use_wandb=False)
    _, frames = next(iter(tr))
    t2.init_state(frames)
    t2.resume(os.path.join("..", "ckpt", "tiny_0_interrupt"))
    assert int(t2.state.step) == step_at_crash
    for a, b in zip(params_at_crash, jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too (not reset like the reference)
    mu = jax.tree.leaves(t2.state.opt_state[0].mu)
    assert any(np.abs(np.asarray(m)).max() > 0 for m in mu)
