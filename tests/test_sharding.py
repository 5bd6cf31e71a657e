"""Multi-device: DP+TP train step on the virtual 8-device CPU mesh.

Checks (a) the sharded step runs and matches the single-device result,
(b) tensor-parallel rules actually shard the attention/FFN kernels.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sd_video_gen_tpu.config import Config
from sd_video_gen_tpu.codecs import PixelCodec
from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.ops import LossWeights
from sd_video_gen_tpu.parallel import (make_mesh, param_shardings,
                                       batch_sharding)
from sd_video_gen_tpu.train.trainer import make_train_step


def _setup(rng):
    cfg = Config(config_name="shard", lr=1e-3, batch_size=8, frames_per_clip=5,
                 frames_to_predict=2, frame_size=32, dim_model=32, num_heads=4,
                 num_encoder_layers=1, num_decoder_layers=1, dropout_p=0.0,
                 use_contrastive=False)
    codec = PixelCodec(cfg.frame_size)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=32,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0,
                                dim_feedforward=64)
    model = FrameTransformer(mc)
    w = LossWeights(use_mse=True, use_gdl=True, use_contrastive=False)
    frames = jnp.asarray(
        rng.integers(0, 255, (8, 5, 32, 32, 3)).astype(np.uint8))
    return cfg, codec, model, w, frames


def test_tp_rules_shard_attention_and_ffn(rng):
    cfg, codec, model, w, frames = _setup(rng)
    mesh = make_mesh("data=2,model=4")
    init_fn, _ = make_train_step(model, codec, w, cfg)
    state = init_fn(jax.random.PRNGKey(0), frames)
    sh = param_shardings(mesh, state.params)
    p = sh["params"]
    assert p["enc_0"]["self_attn"]["qkv"]["kernel"].spec == P(None, "model")
    assert p["enc_0"]["self_attn"]["out"]["kernel"].spec == P("model", None)
    assert p["enc_0"]["ffn"]["lin1"]["kernel"].spec == P(None, "model")
    assert p["enc_0"]["ffn"]["lin2"]["kernel"].spec == P("model", None)
    # embeddings / head / norms replicated
    assert p["embedding"]["kernel"].spec == P()
    assert p["out"]["kernel"].spec == P()
    assert p["enc_0"]["norm1"]["scale"].spec == P()


def test_sharded_step_matches_single_device(rng):
    # SGD, not Adam: at step 1 Adam's m/sqrt(v) is ~sign(g), which amplifies
    # reduction-order noise on near-zero gradient entries into full-size
    # update flips. SGD keeps the comparison well-conditioned while still
    # verifying that DP gradient psums + TP all-reduces are correct.
    import optax
    tx = optax.sgd(1e-2)
    cfg, codec, model, w, frames = _setup(rng)
    init_fn, step_fn = make_train_step(model, codec, w, cfg, tx=tx)
    key = jax.random.PRNGKey(0)

    # single device
    s1 = init_fn(key, frames)
    s1, c1 = step_fn(s1, frames, jax.random.PRNGKey(1))

    # dp=2 x tp=4 mesh
    mesh = make_mesh("data=2,model=4")
    init_fn2, step_fn2 = make_train_step(model, codec, w, cfg, tx=tx)
    s8 = init_fn2(key, frames)
    s8 = jax.device_put(s8, param_shardings(mesh, s8))
    fr8 = jax.device_put(frames, batch_sharding(mesh))
    s8, c8 = step_fn2(s8, fr8, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(c1["total"]), float(c8["total"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_mesh_spec_parsing():
    mesh = make_mesh("data=4,model=2")
    assert mesh.shape == {"data": 4, "model": 2}
    mesh2 = make_mesh()
    assert mesh2.shape["data"] == 8
    try:
        make_mesh("data=3,model=2")
        raised = False
    except ValueError:
        raised = True
    assert raised
