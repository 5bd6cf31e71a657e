"""FrameTransformer: shape/mask/variant behavior + parity of building blocks
with torch nn.Transformer semantics (models/transformer*.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from sd_video_gen_tpu.models.transformer import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.models.identity import IdentityModel
from sd_video_gen_tpu.models.positional import sinusoidal_positions
from sd_video_gen_tpu.ops.masks import causal_mask

LAT = 64  # tiny latent for fast CPU tests


def _small_cfg(**kw):
    d = dict(latent_dim=LAT, dim_model=32, num_heads=4, num_encoder_layers=2,
             num_decoder_layers=2, dropout_p=0.0, dim_feedforward=64)
    d.update(kw)
    return FrameTransformerConfig(**d)


def test_causal_mask_matches_reference():
    # models/transformer.py:70-89 example matrix.
    m = np.asarray(causal_mask(5))
    tri = torch.tril(torch.ones(5, 5) == 1).float()
    ref = tri.masked_fill(tri == 0, float("-inf")).masked_fill(tri == 1, 0.0)
    np.testing.assert_array_equal(m, ref.numpy())


def test_positional_encoding_matches_reference():
    # models/positional_encoding.py:17-25 formula.
    dim, max_len = 32, 64
    pe = torch.zeros(max_len, dim)
    pos = torch.arange(0, max_len, dtype=torch.float).view(-1, 1)
    div = torch.exp(torch.arange(0, dim, 2).float() * (-np.log(10000.0)) / dim)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    np.testing.assert_allclose(np.asarray(sinusoidal_positions(max_len, dim)),
                               pe.numpy(), rtol=1e-5, atol=1e-6)


def test_forward_shapes_and_determinism(rng):
    cfg = _small_cfg()
    model = FrameTransformer(cfg)
    src = jnp.asarray(rng.standard_normal((2, 6, LAT)), jnp.float32)
    tgt = src[:, :-1]
    mask = causal_mask(tgt.shape[1])
    params = model.init(jax.random.PRNGKey(0), src, tgt, tgt_mask=mask)
    out = model.apply(params, src, tgt, tgt_mask=mask)
    assert out.shape == (2, 5, LAT)
    out2 = model.apply(params, src, tgt, tgt_mask=mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_causal_mask_blocks_future(rng):
    """Changing tgt position j must not affect decoder outputs at positions < j."""
    cfg = _small_cfg()
    model = FrameTransformer(cfg)
    src = jnp.asarray(rng.standard_normal((1, 5, LAT)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((1, 4, LAT)), jnp.float32)
    mask = causal_mask(4)
    params = model.init(jax.random.PRNGKey(0), src, tgt, tgt_mask=mask)
    base = np.asarray(model.apply(params, src, tgt, tgt_mask=mask))
    tgt2 = tgt.at[:, -1].add(100.0)
    pert = np.asarray(model.apply(params, src, tgt2, tgt_mask=mask))
    np.testing.assert_allclose(base[:, :3], pert[:, :3], atol=1e-4)
    assert np.abs(base[:, 3] - pert[:, 3]).max() > 1e-3


def test_dropout_rng_changes_output(rng):
    cfg = _small_cfg(dropout_p=0.5)
    model = FrameTransformer(cfg)
    src = jnp.asarray(rng.standard_normal((1, 4, LAT)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), src, src)
    o1 = model.apply(params, src, src, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(params, src, src, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4


def test_future_mode_has_learned_tgt_param(rng):
    cfg = _small_cfg(mode="future", frames_to_predict=3)
    model = FrameTransformer(cfg)
    src = jnp.asarray(rng.standard_normal((2, 5, LAT)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), src, src)
    assert params["params"]["learned_tgt"].shape == (1, 3, LAT)
    out = model.apply(params, src, src)  # trainer passes y_input as tgt, no mask
    assert out.shape == (2, 5, LAT)


def test_learned_tgt_mode_ignores_tgt(rng):
    cfg = _small_cfg(mode="learned_tgt", frames_to_predict=3)
    model = FrameTransformer(cfg)
    src = jnp.asarray(rng.standard_normal((2, 5, LAT)), jnp.float32)
    dummy = jnp.zeros((2, 1, LAT))
    params = model.init(jax.random.PRNGKey(0), src, dummy)
    out = model.apply(params, src, dummy)
    assert out.shape == (2, 3, LAT)  # frames_to_predict queries


def test_text_mode_width_and_conditioning(rng):
    cfg = _small_cfg(mode="text", text_embed_dim=16)
    model = FrameTransformer(cfg)
    src = jnp.asarray(rng.standard_normal((2, 4, LAT)), jnp.float32)
    emb1 = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    emb2 = emb1 + 1.0
    params = model.init(jax.random.PRNGKey(0), src, src, text_embeds=emb1)
    o1 = model.apply(params, src, src, text_embeds=emb1)
    o2 = model.apply(params, src, src, text_embeds=emb2)
    assert o1.shape == (2, 4, LAT)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4


def test_identity_model(rng):
    src = jnp.asarray(rng.standard_normal((2, 5, LAT)), jnp.float32)
    tgt = jnp.zeros((2, 3, LAT))
    model = IdentityModel()
    params = model.init(jax.random.PRNGKey(0), src, tgt)
    out = np.asarray(model.apply(params, src, tgt))
    for t in range(3):
        np.testing.assert_array_equal(out[:, t], np.asarray(src[:, -1]))
