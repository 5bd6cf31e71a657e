"""Full-SD-scale architecture validation without compute (jax.eval_shape).

If our VAE/UNet/CLIP parameter trees have exactly the SD-v1.4 parameter
counts, the converters' targets line up with real checkpoints — catching any
channel/topology drift that tiny-scale parity tests can't see.

Known totals (diffusers SD-v1.4 / transformers CLIP ViT-L/14 text model):
  AutoencoderKL        83,653,863
  UNet2DConditionModel 859,520,964
  CLIPTextModel        123,060,480
"""

import jax
import jax.numpy as jnp

from sd_video_gen_tpu.models.vae import AutoencoderKL, VAEConfig
from sd_video_gen_tpu.models.unet import UNet2DCondition, UNetConfig
from sd_video_gen_tpu.models.clip_text import CLIPTextEncoder, CLIPTextConfig


def _count(tree):
    import numpy as np
    return int(sum(np.prod(l.shape) for l in jax.tree.leaves(tree)))


def test_vae_param_count_matches_sd14():
    model = AutoencoderKL(VAEConfig())
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 256, 256, 3), jnp.float32))
    assert _count(shapes) == 83_653_863


def test_unet_param_count_matches_sd14():
    model = UNet2DCondition(UNetConfig())
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 4), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768), jnp.float32))
    assert _count(shapes) == 859_520_964


def test_clip_param_count_matches_vitl14():
    model = CLIPTextEncoder(CLIPTextConfig())
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 77), jnp.int32))
    assert _count(shapes) == 123_060_480


def test_i3d_param_count():
    """I3D Kinetics-400: ~12.3M parameters (Inception-v1 inflated)."""
    from sd_video_gen_tpu.models.i3d import InceptionI3d, I3DConfig
    model = InceptionI3d(I3DConfig())
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 9, 224, 224, 3), jnp.float32))
    n = _count(shapes)
    assert 12_000_000 < n < 13_000_000, n
