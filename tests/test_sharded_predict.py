"""Multi-chip serving: batch-sharded rollout over the virtual mesh matches
the single-device rollout."""

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.codecs import PixelCodec
from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.parallel import make_mesh, batch_sharding, replicated
from sd_video_gen_tpu.predict.predict import make_predict_fn


def test_sharded_rollout_matches(rng):
    codec = PixelCodec(32)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=32,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0)
    model = FrameTransformer(mc)
    frames = jnp.asarray(rng.integers(0, 255, (8, 5, 32, 32, 3))
                         .astype(np.uint8))
    lat = codec.encode_batch(frames, use_sos=True)
    params = model.init(jax.random.PRNGKey(0), lat, lat[:, :-1])
    predict = make_predict_fn(model, codec, pred_frames=3, window=5)

    _, ref = predict(params, frames)

    mesh = make_mesh("data=8,model=1")
    p8 = jax.device_put(params, replicated(mesh))
    f8 = jax.device_put(frames, batch_sharding(mesh))
    _, out = predict(p8, f8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
