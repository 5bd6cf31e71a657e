"""Regression-locked parity against committed golden fixtures.

The fixtures (tests/fixtures/*.npz, generated once by
tools/make_golden_fixtures.py) hold: diffusers-0.2.3 scheduler constants
from an independent re-derivation, and torch-replica state dicts + inputs +
recorded forward outputs for the full-SD-topology VAE/UNet and the I3D
TF-SAME conv contract. These tests never run torch — a drift in our models,
converters, or schedulers trips them even if the torch-oracle tests were
regenerated with the same bug.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    return dict(np.load(os.path.join(FIXDIR, name)))


def _group(fx, prefix):
    return {k[len(prefix):]: v for k, v in fx.items() if k.startswith(prefix)}


@pytest.mark.parametrize("steps", [10, 50])
def test_ddim_constants_match_fixture(steps):
    from sd_video_gen_tpu.diffusion.schedulers import DDIMSchedule
    fx = _load("scheduler_constants.npz")
    s = DDIMSchedule(steps)
    np.testing.assert_array_equal(np.asarray(s.timesteps),
                                  fx[f"ddim{steps}/timesteps"])
    np.testing.assert_allclose(np.asarray(s.alpha),
                               fx[f"ddim{steps}/alpha"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alpha_prev),
                               fx[f"ddim{steps}/alpha_prev"], rtol=1e-6)


@pytest.mark.parametrize("steps", [10, 50])
def test_lms_constants_match_fixture(steps):
    from sd_video_gen_tpu.diffusion.schedulers import LMSSchedule
    fx = _load("scheduler_constants.npz")
    s = LMSSchedule(steps)
    np.testing.assert_allclose(np.asarray(s.timesteps),
                               fx[f"lms{steps}/timesteps"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.sigmas),
                               fx[f"lms{steps}/sigmas"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.coeffs),
                               fx[f"lms{steps}/coeffs"], rtol=2e-4, atol=1e-7)


def test_vae_golden_forward():
    from sd_video_gen_tpu.diffusion.weights import convert_vae
    from sd_video_gen_tpu.models.vae import AutoencoderKL, VAEConfig
    fx = _load("vae_golden.npz")
    sd = _group(fx, "sd/")
    blocks = tuple(int(b) for b in fx["meta/blocks"])
    params = convert_vae(sd, block_out=blocks,
                         layers_per_block=int(fx["meta/layers"]))
    cfg = VAEConfig(block_out_channels=blocks,
                    layers_per_block=int(fx["meta/layers"]),
                    norm_num_groups=int(fx["meta/groups"]),
                    latent_channels=int(fx["meta/latent"]))
    vae = AutoencoderKL(cfg)
    mean, _ = vae.apply(params, jnp.asarray(fx["in/x"].transpose(0, 2, 3, 1)),
                        method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(mean).transpose(0, 3, 1, 2),
                               fx["out/enc_mean"], rtol=3e-4, atol=3e-5)
    dec = vae.apply(params, jnp.asarray(fx["in/z"].transpose(0, 2, 3, 1)),
                    method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec).transpose(0, 3, 1, 2),
                               fx["out/dec"], rtol=3e-4, atol=3e-5)


def test_unet_golden_forward():
    from sd_video_gen_tpu.diffusion.weights import convert_unet
    from sd_video_gen_tpu.models.unet import UNet2DCondition, UNetConfig
    fx = _load("unet_golden.npz")
    sd = _group(fx, "sd/")
    blocks = tuple(int(b) for b in fx["meta/blocks"])
    params = convert_unet(sd, block_out=blocks,
                          layers_per_block=int(fx["meta/layers"]))
    cfg = UNetConfig(block_out_channels=blocks,
                     layers_per_block=int(fx["meta/layers"]),
                     attention_heads=int(fx["meta/heads"]),
                     cross_attention_dim=int(fx["meta/ctx_dim"]),
                     norm_num_groups=int(fx["meta/groups"]))
    unet = UNet2DCondition(cfg)
    out = unet.apply(params, jnp.asarray(fx["in/x"].transpose(0, 2, 3, 1)),
                     jnp.asarray(fx["in/t"], jnp.int32),
                     jnp.asarray(fx["in/ctx"]))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               fx["out/eps"], rtol=3e-4, atol=3e-5)


def test_i3d_same_padding_golden():
    import jax
    fx = _load("i3d_golden.npz")
    w = jnp.asarray(fx["sd/weight"].transpose(2, 3, 4, 1, 0))  # DHWIO
    y = jax.lax.conv_general_dilated(
        jnp.asarray(fx["in/x"]), w, window_strides=(2, 2, 2), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y = y + jnp.asarray(fx["sd/bias"])
    np.testing.assert_allclose(np.asarray(y).transpose(0, 4, 1, 2, 3),
                               fx["out/y"], rtol=1e-4, atol=1e-5)
