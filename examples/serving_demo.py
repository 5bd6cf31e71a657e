"""Serving demo: many concurrent video-prediction streams on one chip.

Shows the production inference path end-to-end without any external data or
weights (random-init flagship model; plug a trained checkpoint in with
--checkpoint or a reference .pt with --torch_checkpoint):

  uint8 frames -> latent encode -> KV-cached incremental AR rollout
  (optionally int8 weights) -> pixel decode, all inside ONE jitted program,
  repeated over batches of independent streams.

Compare: the reference serves one stream by re-running its full
encoder+decoder per frame from a Python loop with host round trips
(prediction/predict.py:16-42). Measured on a TPU v5e chip at batch 256 this
path sustains ~80K generated frames/sec bf16 / ~91K int8 (bench.py,
BASELINE.md) vs ~150/sec estimated for the reference.

Usage:
  python examples/serving_demo.py                  # tiny model, any backend
  python examples/serving_demo.py --flagship       # 2048-dim model (TPU)
  python examples/serving_demo.py --int8           # quantized weights
  python examples/serving_demo.py --checkpoint ./checkpoints/<cfg>_<i>_test \
      --config <cfg>                               # serve a trained model
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true",
                    help="dim 2048, 4 enc + 8 dec (else a tiny CPU-friendly model)")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--batch", type=int, default=None,
                    help="concurrent streams (default: 256 flagship / 8 tiny)")
    ap.add_argument("--frames", type=int, default=16, help="frames per stream")
    ap.add_argument("--frame_size", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="Orbax checkpoint dir from the trainer")
    ap.add_argument("--torch_checkpoint", type=str, default=None,
                    help="a reference-trained .pt state_dict")
    ap.add_argument("--config", type=str, default=None,
                    help="config name (required with --checkpoint)")
    args = ap.parse_args()

    from sd_video_gen_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from sd_video_gen_tpu.codecs import PixelCodec
    from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
    from sd_video_gen_tpu.ops.cached_rollout import (cached_rollout,
                                                     quantize_rollout_params)

    if (args.checkpoint or args.torch_checkpoint) and not args.config:
        raise SystemExit("--config is required with --checkpoint/"
                         "--torch_checkpoint (the model dims and frame size "
                         "come from it)")
    cfg = None
    if args.config:
        from sd_video_gen_tpu.config import load_config
        cfg = load_config(args.config)
    if cfg is not None and (args.checkpoint or args.torch_checkpoint):
        # a trained checkpoint's dims/frame size come from ITS config —
        # building the tiny/flagship demo dims here either failed the
        # restore or silently served a partially-loaded model
        codec = PixelCodec(cfg.frame_size)
        mc = FrameTransformerConfig.from_config(cfg)
        import dataclasses
        mc = dataclasses.replace(mc, dtype=jnp.bfloat16)
        batch = args.batch or 8
    else:
        codec = PixelCodec(args.frame_size)
        if args.flagship:
            dims = dict(dim_model=2048, num_heads=8, num_encoder_layers=4,
                        num_decoder_layers=8)
            batch = args.batch or 256
        else:
            dims = dict(dim_model=128, num_heads=4, num_encoder_layers=2,
                        num_decoder_layers=2)
            batch = args.batch or 8
        mc = FrameTransformerConfig(latent_dim=codec.latent_dim,
                                    dropout_p=0.0, dtype=jnp.bfloat16,
                                    **dims)
    model = FrameTransformer(mc)

    context = 5
    fsize = codec.frame_size
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 255, (batch, context, fsize, fsize, 3)), jnp.uint8)

    if args.torch_checkpoint:
        # load_model_params validates the converted tree against the model
        # (a .pt with more layers than the config would otherwise serve
        # partially loaded)
        from types import SimpleNamespace
        from sd_video_gen_tpu.predict.predict import load_model_params
        ns = SimpleNamespace(checkpoint_dir=".", config=args.config, index=0,
                             mode="test",
                             torch_checkpoint=args.torch_checkpoint)
        params = load_model_params(cfg, ns, model, codec, "test")
    elif args.checkpoint:
        import re
        from types import SimpleNamespace
        from sd_video_gen_tpu.predict.predict import load_model_params
        # parse <config>_<index>_<mode> from the basename instead of
        # hard-coding index 0 (the trainer auto-increments per run —
        # hard-coding silently served a stale earlier checkpoint)
        base = os.path.basename(args.checkpoint.rstrip("/"))
        m = re.search(r"_(\d+)_(\w+)$", base)
        idx, mode = (int(m.group(1)), m.group(2)) if m else (0, "test")
        ns = SimpleNamespace(checkpoint_dir=os.path.dirname(args.checkpoint)
                             or ".", config=args.config, index=idx,
                             mode=mode, torch_checkpoint=None)
        params = load_model_params(cfg, ns, model, codec, "test")
    else:
        print("no checkpoint given - serving a random-init model (throughput "
              "demo only)")
        lat = jax.jit(lambda f: codec.encode_batch(f, use_sos=True))(frames)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), lat, lat[:, :-1])
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)
    if args.int8:
        params = jax.jit(quantize_rollout_params)(params)

    @jax.jit
    def serve(params, frames_u8):
        lat = codec.encode_batch(frames_u8, use_sos=True)
        preds = cached_rollout(mc, params, lat, args.frames)
        return codec.decode_latents(preds.reshape(-1, codec.latent_dim))

    # Timing syncs on a device-side checksum: fetching the full uint8 batch
    # through the dev tunnel costs seconds and would swamp compute (a real
    # deployment streams results over PCIe/ICI on the TPU host).
    @jax.jit
    def serve_checksum(params, frames_u8):
        return jnp.sum(serve(params, frames_u8).astype(jnp.int32))

    _ = int(serve_checksum(params, frames))  # compile + warmup
    total, best = 0.0, float("inf")
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        _ = int(serve_checksum(params, frames))
        dt = time.perf_counter() - t0
        total += dt
        best = min(best, dt)
    out = np.asarray(serve(params, frames))  # fetch results once, untimed
    n = batch * args.frames
    print(f"backend={jax.default_backend()} streams={batch} "
          f"frames/stream={args.frames} int8={args.int8}")
    print(f"generated {n} frames/round: best {n/best:,.0f} frames/sec "
          f"(mean {n*args.rounds/total:,.0f})")
    print(f"output: {out.shape} {out.dtype}")


if __name__ == "__main__":
    main()
