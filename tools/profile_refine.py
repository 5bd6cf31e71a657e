"""Time the full refine_apply hook and the bare rollout to locate the gap
between piece-sum (~45ms/frame) and the measured pipeline (225ms/frame)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from sd_video_gen_tpu.config import Config
from sd_video_gen_tpu.diffusion.sd import SDPipeline
from sd_video_gen_tpu.diffusion.refine import make_denoise_refiner
from sd_video_gen_tpu.diffusion.vae_codec import VAECodec
from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.ops.rollout import ar_rollout

REP = 4


def bench(name, fn, *args):
    jfn = jax.jit(fn)
    _ = jax.tree.map(lambda x: np.asarray(x), jfn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.tree.map(lambda x: np.asarray(x), jfn(*args))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"piece": name, "ms": round(best * 1e3, 2)}), flush=True)


def main():
    cfg = Config(config_name="bench", frame_size=64)
    pipe = SDPipeline(frame_size=512, dtype=jnp.bfloat16)
    refine_apply, rp = make_denoise_refiner(cfg, start_step=40,
                                            pipeline=pipe, hi_res=512)
    rp = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, rp)
    codec = VAECodec(64, params=pipe.vae.params, cfg=pipe.vae.cfg)

    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, codec.latent_dim)), jnp.float32)

    def refine_rep(rp, lat):
        def body(z, i):
            return refine_apply(rp, z, i), 0
        z, _ = jax.lax.scan(body, lat, jnp.arange(REP))
        return z

    bench(f"refine_apply_x{REP}", refine_rep, rp, lat)

    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=2048,
                                num_heads=8, num_encoder_layers=4,
                                num_decoder_layers=8, dropout_p=0.0,
                                dtype=jnp.bfloat16)
    model = FrameTransformer(mc)
    ctx = jnp.asarray(rng.standard_normal((1, 6, codec.latent_dim)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ctx, ctx[:, :-1])
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)
    bench("bare_rollout_4f", lambda p, c: ar_rollout(model.apply, p, c, 4,
                                                     window=5), params, ctx)


if __name__ == "__main__":
    main()
