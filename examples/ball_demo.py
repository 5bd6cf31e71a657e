"""End-to-end demo: synthesize data, train, roll out, beat the copy baseline.

Runs on any backend (CPU works; TPU recommended). On a v5e chip this trains
a 5M-param model in ~2 minutes and reproduces:

    first epoch: train_loss ~1.8   last epoch: train_loss ~0.76
    rollout pixel MSE: model ~1680 < naive-copy ~2680

Usage: python examples/ball_demo.py [--epochs 12] [--size 64]
"""

import argparse
import os
import sys

# runnable as `python examples/ball_demo.py` without installing the package
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.config import Config
from sd_video_gen_tpu.data import (BatchLoader, BouncingBallDataset,
                                   generate_bouncing_ball_tree)
from sd_video_gen_tpu.ops.rollout import ar_rollout
from sd_video_gen_tpu.train.trainer import Trainer
from sd_video_gen_tpu.utils.cache import enable_compilation_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--data_dir", type=str, default="/tmp/sdvg_ball_demo")
    args = p.parse_args()
    enable_compilation_cache()

    root = generate_bouncing_ball_tree(args.data_dir, n_train_seqs=40,
                                       n_test_seqs=8, frames_per_seq=30,
                                       size=args.size, seed=1)
    cfg = Config(config_name="demo", lr=3e-4, batch_size=16,
                 epochs=args.epochs, frames_per_clip=5, frames_to_predict=4,
                 frame_size=args.size, dim_model=256, num_heads=8,
                 num_encoder_layers=2, num_decoder_layers=4, dropout_p=0.1,
                 use_mse=True, use_gdl=True, use_contrastive=True,
                 lambda_contrastive=0.025)
    trainer = Trainer(cfg, mode="ar", codec_kind="pixel", use_wandb=False,
                      checkpoint_dir=args.data_dir + "/ckpt")
    tl = BatchLoader(BouncingBallDataset(5, 1, root, "train", seed=0), 16,
                     seed=1)
    vl = BatchLoader(BouncingBallDataset(5, 1, root, "test", seed=0), 16,
                     seed=1)
    # save_best=False: the rollout below evaluates trainer.state.params
    # (the LAST epoch); saving a different 'best' epoch while judging the
    # last one made the printed verdict evaluate the wrong weights
    hist = trainer.fit(tl, vl, epochs=args.epochs, save_best=False)
    print(f"train_loss: {hist[0]['train_loss']:.3f} -> "
          f"{hist[-1]['train_loss']:.3f}")

    # 4-frame rollout vs copy-last-frame baseline, pixel MSE
    codec = trainer.codec
    _, frames9 = BouncingBallDataset(9, 1, root, "test", shuffle=False)[0]
    f = jnp.asarray(frames9)[None]
    ctx, gt = f[:, :5], f[:, 5:9].astype(jnp.float32)
    lat = codec.encode_batch(ctx, use_sos=True)
    preds = ar_rollout(trainer.model.apply, trainer.state.params, lat, 4,
                       window=5)
    dec = codec.decode_latents(preds.reshape(-1, codec.latent_dim)).reshape(
        1, 4, args.size, args.size, 3).astype(jnp.float32)
    mse_model = float(jnp.mean(jnp.square(dec - gt)))
    naive = jnp.repeat(ctx[:, -1:], 4, axis=1).astype(jnp.float32)
    mse_naive = float(jnp.mean(jnp.square(naive - gt)))
    print(f"rollout pixel MSE: model={mse_model:.0f} "
          f"naive-copy={mse_naive:.0f} -> "
          f"{'beats baseline' if mse_model < mse_naive else 'NOT learning'}")


if __name__ == "__main__":
    main()
