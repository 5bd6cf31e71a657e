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
