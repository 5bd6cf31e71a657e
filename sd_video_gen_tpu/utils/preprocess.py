"""Offline latent-cache tool: VAE-encode frame trees to .npy once, up front.

Reference: utils/preprocess.py:15-52 encoded every PNG to a per-image .npy
latent (a cache tool that was never wired into the loaders — the trainer
re-encoded pixels every epoch, the #1 hot-loop waste in SURVEY.md §3.1).
Here the tool writes ONE contiguous (N, T, latent_dim) array + clip index per
stage, which data/latent_cache.LatentCacheDataset (and the native C++ loader)
can mmap for zero-decode training epochs.

Usage:
  python -m sd_video_gen_tpu.utils.preprocess --dataset ball --folder <dir> \
      --config <cfg> [--codec vae --vae_weights sd_vae.safetensors] --out cache/
"""

from __future__ import annotations

import json
import os
import warnings

import jax
import numpy as np
import jax.numpy as jnp

from sd_video_gen_tpu.codecs import make_codec
from sd_video_gen_tpu.config import build_arg_parser, load_config


def build_latent_cache(dataset, codec, out_dir: str, stage: str,
                       batch: int = 16) -> str:
    os.makedirs(out_dir, exist_ok=True)
    # one compiled program per batch shape instead of op-by-op eager
    # dispatch — over the high-latency tunnel an un-jitted VAE encode of a
    # whole dataset pays ~50ms RPC per op
    encode = jax.jit(codec.encode_frames)
    lats, indices = [], []
    for start in range(0, len(dataset), batch):
        frames = []
        for i in range(start, min(start + batch, len(dataset))):
            idx, fr = dataset[i]
            indices.append(list(map(int, idx)) if hasattr(idx, "__len__")
                           else [int(idx)])
            frames.append(fr)
        x = jnp.asarray(np.stack(frames))
        lats.append(np.asarray(encode(x)))
    arr = np.concatenate(lats, axis=0).astype(np.float32)
    path = os.path.join(out_dir, f"{stage}_latents.npy")
    np.save(path, arr)
    with open(os.path.join(out_dir, f"{stage}_index.json"), "w") as f:
        json.dump(indices, f)
    return path


def main(argv=None):
    p = build_arg_parser()
    p.add_argument("--codec", type=str, default="pixel",
                   choices=["pixel", "vae"])
    p.add_argument("--out", type=str, default="latent_cache")
    args = p.parse_args(argv)
    cfg = load_config(args.config, args.config_dir)

    vae_params = None
    if args.codec == "vae" and args.vae_weights:
        from sd_video_gen_tpu.diffusion.weights import (load_state_dict,
                                                        convert_vae)
        vae_params = convert_vae(load_state_dict(args.vae_weights))
    elif args.codec == "vae":
        # a latent cache is a PERSISTENT artifact; encoding it with a
        # random-init VAE writes garbage to disk that silently poisons
        # every later training run
        warnings.warn(
            "--codec vae without --vae_weights: building the latent cache "
            "with a RANDOM-INIT VAE — the cached latents are meaningless "
            "for real training", stacklevel=1)
    codec = make_codec(cfg, args.codec, vae_params=vae_params)

    from sd_video_gen_tpu.train.trainer import build_dataset
    for stage in ("train", "test"):
        ds = build_dataset(cfg, args, stage)
        path = build_latent_cache(ds, codec, args.out, stage)
        print(f"{stage}: {len(ds)} clips -> {path}")


if __name__ == "__main__":
    main()
