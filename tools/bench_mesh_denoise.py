"""8-device model-parallel denoise dryrun: ONE stream across the mesh.

r2's multi-chip denoise was batch-parallel only (UNet/VAE replicated); the
diffusion_param_shardings rules (parallel/sharding.py) let a single denoise
stream span chips. This tool proves the composition on the virtual CPU mesh:
a reduced-width SD pipeline (VAE encode -> DDIM partial-denoise scan ->
VAE decode) jitted with model-sharded UNet/VAE params, checksum-compared
against the single-device run for every mesh in 1/2/4/8.

Attention legs: the plain-jit pass lets GSPMD partition the einsum
attention; a second pass per mesh activates ops/attention.
head_sharded_attention, which shard_maps self-attention over the model axis
(per-device flash kernels on TPU — the composition GSPMD cannot derive for
a pallas_call) and must match the single-device checksum too. Run:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/bench_mesh_denoise.py
"""

import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from sd_video_gen_tpu.models.unet import UNet2DCondition, UNetConfig
    from sd_video_gen_tpu.models.vae import AutoencoderKL, VAEConfig
    from sd_video_gen_tpu.diffusion.schedulers import DDIMSchedule
    from sd_video_gen_tpu.parallel import make_mesh, diffusion_param_shardings

    ucfg = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                      attention_heads=4, cross_attention_dim=32,
                      norm_num_groups=8)
    unet = UNet2DCondition(ucfg)
    vcfg = VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                     norm_num_groups=8)
    vae = AutoencoderKL(vcfg)

    rng = np.random.default_rng(0)
    # batch 2 x 4 heads = head-batch 8: the head-sharded leg engages on
    # every mesh size swept below
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)) * 0.3, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 2, 32)), jnp.float32)

    up = unet.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 4)),
                   jnp.zeros((2,), jnp.int32), ctx)
    vp = vae.init(jax.random.PRNGKey(1), img)

    sched = DDIMSchedule(10)
    timesteps = jnp.asarray(sched.timesteps.copy(), jnp.float32)
    start = 6

    def pipeline(up, vp, img):
        z, _ = vae.apply(vp, img, method=AutoencoderKL.encode)
        x = sched.add_noise_at(
            z, jax.random.normal(jax.random.PRNGKey(2), z.shape), start)

        def body(x, i):
            eps = unet.apply(up, x, jnp.broadcast_to(timesteps[i],
                                                     (x.shape[0],)), ctx)
            return sched.step(eps, i, x), None

        x, _ = jax.lax.scan(body, x, jnp.arange(start, 10))
        return vae.apply(vp, x, method=AutoencoderKL.decode)

    ref = np.asarray(jax.jit(pipeline)(up, vp, img))
    print(json.dumps({"mesh": "single", "checksum": float(np.abs(ref).sum())}),
          flush=True)

    from sd_video_gen_tpu.ops.attention import head_sharded_attention

    for n in (2, 4, 8):
        mesh = make_mesh(f"data=1,model={n}", devices=jax.devices()[:n])
        up_s = jax.device_put(up, diffusion_param_shardings(mesh, up))
        vp_s = jax.device_put(vp, diffusion_param_shardings(mesh, vp))
        for attn in ("gspmd-einsum", "head-sharded"):
            # NB: a fresh wrapper per leg — jax.jit(pipeline) with identical
            # avals would CACHE-HIT the other leg's trace and silently skip
            # the shard_map path (the context is a trace-time switch, not
            # part of jit's cache key). Caught by review: the head-sharded
            # leg originally validated the einsum program twice.
            fresh = jax.jit(lambda a, b, c: pipeline(a, b, c))
            if attn == "head-sharded":
                with head_sharded_attention(mesh):
                    out = np.asarray(fresh(up_s, vp_s, img))
            else:
                out = np.asarray(fresh(up_s, vp_s, img))
            ok = bool(np.allclose(out, ref, rtol=2e-4, atol=2e-5))
            print(json.dumps({"mesh": f"model={n}", "attention": attn,
                              "checksum": float(np.abs(out).sum()),
                              "matches_single": ok}), flush=True)
            if not ok:
                raise SystemExit(f"model={n} {attn} mismatch")
    print(json.dumps({"ok": True}))


if __name__ == "__main__":
    main()
