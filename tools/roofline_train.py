"""Roofline for the flagship train step: per-piece measured ms vs XLA FLOPs.

The r3 knee sweep (tools/bench_knee.py) puts the tuned operating point at
bf16_full batch 288 with an analytic MFU of 0.45. This tool decomposes the
step so the missing 55% is attributed, not guessed: pieces are the uint8
frame encode, the model forward + composite loss, forward+backward, and the
Adam update — each timed with the CSE-proof chained-scan harness and paired
with the compiled executable's own cost analysis.

Reference hot loop being modeled: /root/reference/trainers/trainer.py:111-190
(encode -> forward -> composite loss -> backward -> Adam), here as one fused
XLA program (sd_video_gen_tpu/train/trainer.py:make_train_step).

Usage: python tools/roofline_train.py [batch ...]   (default 6 96 288)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sd_video_gen_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from tools._bench_harness import (V5E_PEAK_BF16, flops_of, measure)


def main():
    batches = [int(b) for b in sys.argv[1:]] or [6, 96, 288]
    precision = os.environ.get("SDVG_ROOFLINE_PRECISION", "bf16_full")

    from sd_video_gen_tpu.config import Config
    from sd_video_gen_tpu.codecs import PixelCodec
    from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
    from sd_video_gen_tpu.ops import LossWeights, causal_mask, composite_loss
    from sd_video_gen_tpu.train.trainer import encode_or_passthrough

    for B in batches:
        cfg = Config(config_name="11_27_ucf_final", lr=1e-5, batch_size=B,
                     frames_per_clip=5, frames_to_predict=5, frame_size=128,
                     dim_model=2048, num_heads=8, num_encoder_layers=4,
                     num_decoder_layers=8, dropout_p=0.1, use_mse=True,
                     use_gdl=True, lambda_gdl=1.0, use_contrastive=True,
                     lambda_contrastive=0.025)
        codec = PixelCodec(cfg.frame_size)
        mc = FrameTransformerConfig(
            latent_dim=codec.latent_dim, dim_model=cfg.dim_model,
            num_heads=cfg.num_heads,
            num_encoder_layers=cfg.num_encoder_layers,
            num_decoder_layers=cfg.num_decoder_layers,
            dropout_p=cfg.dropout_p,
            dtype=jnp.float32 if precision == "f32" else jnp.bfloat16,
            param_dtype=(jnp.bfloat16 if precision == "bf16_full"
                         else jnp.float32))
        model = FrameTransformer(mc)
        w = LossWeights.from_config(cfg)
        k = cfg.frames_to_predict

        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.integers(
            0, 255, (B, cfg.frames_per_clip + k, cfg.frame_size,
                     cfg.frame_size, 3)).astype(np.uint8))
        latents = jax.jit(lambda f: encode_or_passthrough(codec, f, True,
                                                          None))(frames)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), latents,
                                     latents[:, :-1],
                                     tgt_mask=causal_mask(latents.shape[1] - 1))
        tx = optax.adam(cfg.lr, mu_dtype=(jnp.bfloat16
                                          if precision == "bf16_full"
                                          else None))
        opt_state = jax.jit(tx.init)(params)
        key = jax.random.PRNGKey(1)

        def encode(frames):
            return encode_or_passthrough(codec, frames, True, None)

        def loss_from_latents(latents, params):
            y_in = latents[:, :-1]
            pred = model.apply(params, latents, y_in,
                               tgt_mask=causal_mask(y_in.shape[1]),
                               deterministic=False, rngs={"dropout": key})
            pred_k = pred[:, -k:]
            tgt_k = latents[:, 1:][:, -k:]
            _, comps = composite_loss(pred_k.astype(jnp.float32),
                                      tgt_k.astype(jnp.float32), w)
            return comps["total"]

        def fwd(latents, params):
            return loss_from_latents(latents, params)

        def fwd_bwd(latents, params):
            return jax.grad(loss_from_latents, argnums=1)(latents, params)

        grads = jax.jit(fwd_bwd)(latents, params)

        def adam(grads, opt_state, params):
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates)

        def full_step(frames, params, opt_state):
            lat = encode(frames)
            g = jax.grad(loss_from_latents, argnums=1)(lat, params)
            updates, _ = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates)

        pieces = (("encode_u8_128px", encode, (frames,)),
                  ("fwd_loss", fwd, (latents, params)),
                  ("fwd_bwd", fwd_bwd, (latents, params)),
                  ("adam_update", adam, (grads, opt_state, params)),
                  ("full_step", full_step, (frames, params, opt_state)))
        for name, fn, args in pieces:
            fl = flops_of(fn, *args)
            dt = measure(fn, *args)
            print(json.dumps({
                "piece": name, "batch": B, "precision": precision,
                "ms": round(dt * 1e3, 2),
                "gflops": round(fl / 1e9, 1),
                "mfu": round(fl / dt / V5E_PEAK_BF16, 3)}), flush=True)


if __name__ == "__main__":
    main()
