"""Native-resolution denoise refiner (eval-harness variant, no pixel trip)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sd_video_gen_tpu.config import Config
from sd_video_gen_tpu.diffusion.refine import make_denoise_refiner
from sd_video_gen_tpu.diffusion.sd import SDPipeline
from sd_video_gen_tpu.models.vae import VAEConfig
from sd_video_gen_tpu.models.unet import UNetConfig
from sd_video_gen_tpu.models.clip_text import CLIPTextConfig


def test_native_res_refiner():
    cfg = Config(config_name="t", frame_size=32)
    with pytest.warns(UserWarning):
        pipe = SDPipeline(
            frame_size=32,
            vae_cfg=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                              norm_num_groups=2),
            unet_cfg=UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                                attention_heads=2, cross_attention_dim=16,
                                norm_num_groups=2),
            clip_cfg=CLIPTextConfig(hidden_size=16, num_layers=1, num_heads=2,
                                    intermediate_size=32, max_length=8))
    apply_fn, params = make_denoise_refiner(cfg, start_step=2, pipeline=pipe,
                                            num_inference_steps=4, hi_res=None)
    # the flat latents live on the PIPE VAE's grid (2-block tiny VAE ->
    # /2 compression, latent_hw 16 at 32px) — the refiner must derive the
    # grid from the VAE, not assume SD's /8 (review regression: a
    # hard-coded //8 scrambled/crashed any non-SD topology)
    assert pipe.vae.latent_hw == 16
    L = 4 * pipe.vae.latent_hw ** 2
    flat = jnp.asarray(np.random.default_rng(0).standard_normal((2, L)),
                       jnp.float32)
    out = jax.jit(apply_fn)(params, flat)
    assert out.shape == (2, L)
    assert np.isfinite(np.asarray(out)).all()
    # refinement actually changes the latent (UNet steps applied)
    assert np.abs(np.asarray(out) - np.asarray(flat)).max() > 1e-3


def _tiny_pipe(dtype):
    return SDPipeline(
        frame_size=32, dtype=dtype,
        vae_cfg=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                          norm_num_groups=2, dtype=dtype),
        unet_cfg=UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                            attention_heads=2, cross_attention_dim=16,
                            norm_num_groups=2, dtype=dtype),
        clip_cfg=CLIPTextConfig(hidden_size=16, num_layers=1, num_heads=2,
                                intermediate_size=32, max_length=8,
                                dtype=dtype))


def test_refiner_bf16_serving_dtype():
    """--denoise_precision bf16: a bf16 pipeline's refiner must (a) store its
    HBM-resident vae/unet weights in bf16 — flax casts at use, so f32 copies
    would double the weight stream per UNet step — and (b) track the f32
    refiner within bf16 resolution. Params come from shared f32 init so the
    two refiners compute the same function at different precisions."""
    cfg = Config(config_name="t", frame_size=32)
    with pytest.warns(UserWarning):
        pipe32 = _tiny_pipe(jnp.float32)
    pipe16 = _tiny_pipe(jnp.bfloat16)
    pipe16.unet_params = pipe32.unet_params
    pipe16.vae.params = pipe32.vae.params
    pipe16.clip_params = pipe32.clip_params
    f32, p32 = make_denoise_refiner(cfg, start_step=2, pipeline=pipe32,
                                    num_inference_steps=4, hi_res=None)
    f16, p16 = make_denoise_refiner(cfg, start_step=2, pipeline=pipe16,
                                    num_inference_steps=4, hi_res=None)
    leaves = jax.tree.leaves({"vae": p16["vae"], "unet": p16["unet"]})
    assert all(l.dtype == jnp.bfloat16 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))
    L = 4 * pipe32.vae.latent_hw ** 2
    flat = jnp.asarray(np.random.default_rng(1).standard_normal((2, L)) * 0.1,
                       jnp.float32)
    o32 = np.asarray(jax.jit(f32)(p32, flat), np.float32)
    o16 = np.asarray(jax.jit(f16)(p16, flat), np.float32)
    assert np.isfinite(o16).all()
    scale = np.max(np.abs(o32))
    assert np.max(np.abs(o16 - o32)) / scale < 0.1, \
        f"bf16 refiner drifted {np.max(np.abs(o16 - o32)) / scale:.3f}"


def test_dpmpp_refiner_same_interval_fewer_evals():
    """--denoise_sampler dpmpp: the refiner runs DPM-Solver++(2M) over the
    SAME noise interval as the DDIM tail (identical add-noise level) in
    solver_steps UNet evals; output must be finite, shaped, and in the same
    neighborhood as the DDIM result (both approximate one ODE endpoint —
    accuracy evidence is analytic in tests/test_dpmpp.py)."""
    cfg = Config(config_name="t", frame_size=32)
    with pytest.warns(UserWarning):
        pipe = SDPipeline(
            frame_size=32,
            vae_cfg=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                              norm_num_groups=2),
            unet_cfg=UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                                attention_heads=2, cross_attention_dim=16,
                                norm_num_groups=2),
            clip_cfg=CLIPTextConfig(hidden_size=16, num_layers=1, num_heads=2,
                                    intermediate_size=32, max_length=8))
    ddim_fn, ddim_p = make_denoise_refiner(cfg, start_step=2, pipeline=pipe,
                                           num_inference_steps=8, hi_res=None)
    dpm_fn, dpm_p = make_denoise_refiner(cfg, start_step=2, pipeline=pipe,
                                         num_inference_steps=8, hi_res=None,
                                         sampler="dpmpp", solver_steps=3)
    L = 4 * pipe.vae.latent_hw ** 2
    flat = jnp.asarray(np.random.default_rng(1).standard_normal((2, L)),
                       jnp.float32)
    out_ddim = np.asarray(jax.jit(ddim_fn)(ddim_p, flat))
    out_dpm = np.asarray(jax.jit(dpm_fn)(dpm_p, flat))
    assert out_dpm.shape == (2, L)
    assert np.isfinite(out_dpm).all()
    assert np.abs(out_dpm - np.asarray(flat)).max() > 1e-3  # steps applied
    # same ODE, different discretization: correlated but not identical.
    # The bound is loose (0.5) because this UNet is RANDOM-INIT — its drift
    # field is rough, so coarse discretizations legitimately diverge
    # (measured corr ~0.73 here); the sampler's ACCURACY claim is proven
    # against an exact analytic eps-model in tests/test_dpmpp.py instead.
    assert not np.allclose(out_dpm, out_ddim)
    corr = np.corrcoef(out_dpm.ravel(), out_ddim.ravel())[0, 1]
    assert corr > 0.5, corr


def test_dpmpp_rejects_unknown_sampler():
    cfg = Config(config_name="t", frame_size=32)
    with pytest.warns(UserWarning):
        pipe = SDPipeline(
            frame_size=32,
            vae_cfg=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                              norm_num_groups=2),
            unet_cfg=UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                                attention_heads=2, cross_attention_dim=16,
                                norm_num_groups=2),
            clip_cfg=CLIPTextConfig(hidden_size=16, num_layers=1, num_heads=2,
                                    intermediate_size=32, max_length=8))
    fn, p = make_denoise_refiner(cfg, start_step=2, pipeline=pipe,
                                 num_inference_steps=8, hi_res=None,
                                 sampler="euler")
    L = 4 * pipe.vae.latent_hw ** 2
    flat = jnp.zeros((1, L), jnp.float32)
    with pytest.raises(ValueError, match="unknown sampler"):
        fn(p, flat)
