"""Real-weight rehearsal: full-scale HF state dicts with exact key names.

The reference's entire L0 is from_pretrained of real SD-v1.4 / CLIP
checkpoints (utils/sd_utils.py:52-66). No real weights exist in this
environment, so these tests convert FULL-SIZE synthetic state dicts whose
key names and shapes reproduce the published checkpoints exactly (the
generators in tools/synthetic_checkpoint.py match the published param
counts to the digit: VAE 83,653,863 / UNet 859,520,964 / CLIP 123,060,480)
and prove the conversion is bidirectionally exhaustive:

  - convert_exhaustive: every checkpoint key is consumed (a missed key
    would silently keep random init);
  - assert_matches_model: every model param is filled, no extras, shapes
    equal (via jax.eval_shape of the module init — zero FLOPs).

The on-chip 512px forward with converted full-size weights is recorded by
tools/rehearse_real_weights.py (results in PARITY.md) — too heavy for the
1-core CPU test host.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from synthetic_checkpoint import (PARAM_COUNTS, clip_state_dict,
                                  unet_state_dict, vae_state_dict)
from sd_video_gen_tpu.diffusion.weights import (assert_matches_model,
                                                convert_exhaustive)


def _count(sd):
    return sum(int(np.prod(v.shape)) for k, v in sd.items()
               if "position_ids" not in k)


@pytest.mark.parametrize("vintage", ["0.2.3", "modern"])
def test_vae_full_scale_conversion(vintage):
    sd = vae_state_dict(vintage)
    assert _count(sd) == PARAM_COUNTS["vae"]
    params = convert_exhaustive("vae", sd)

    from sd_video_gen_tpu.models.vae import AutoencoderKL, VAEConfig
    model = AutoencoderKL(VAEConfig())
    abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert_matches_model(params, abstract)


def test_unet_full_scale_conversion():
    sd = unet_state_dict()
    assert _count(sd) == PARAM_COUNTS["unet"]
    params = convert_exhaustive("unet", sd)

    from sd_video_gen_tpu.models.unet import UNet2DCondition, UNetConfig
    cfg = UNetConfig()
    model = UNet2DCondition(cfg)
    abstract = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, cfg.in_channels), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2, cfg.cross_attention_dim), jnp.float32))
    assert_matches_model(params, abstract)


def test_clip_full_scale_conversion():
    sd = clip_state_dict()
    assert _count(sd) == PARAM_COUNTS["clip"]
    params = convert_exhaustive("clip", sd)

    from sd_video_gen_tpu.models.clip_text import (CLIPTextConfig,
                                                   CLIPTextEncoder,
                                                   empty_prompt_ids)
    cfg = CLIPTextConfig()
    model = CLIPTextEncoder(cfg)
    abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              empty_prompt_ids(1, cfg.max_length))
    assert_matches_model(params, abstract)


def test_unconsumed_key_detected():
    sd = vae_state_dict("0.2.3")
    sd["encoder.mystery_extra.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="never.*consumed|consumed"):
        convert_exhaustive("vae", sd)


def test_missing_model_param_detected():
    sd = vae_state_dict("0.2.3")
    params = convert_exhaustive("vae", sd)
    del params["params"]["encoder"]["conv_in"]

    from sd_video_gen_tpu.models.vae import AutoencoderKL, VAEConfig
    model = AutoencoderKL(VAEConfig())
    abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3), jnp.float32))
    with pytest.raises(ValueError, match="missing"):
        assert_matches_model(params, abstract)


def test_shape_mismatch_detected():
    sd = vae_state_dict("0.2.3")
    params = convert_exhaustive("vae", sd)
    params["params"]["quant_conv"]["bias"] = jnp.zeros((16,), jnp.float32)

    from sd_video_gen_tpu.models.vae import AutoencoderKL, VAEConfig
    model = AutoencoderKL(VAEConfig())
    abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3), jnp.float32))
    with pytest.raises(ValueError, match="shape"):
        assert_matches_model(params, abstract)
