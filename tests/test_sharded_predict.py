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


def test_sharded_feature_stats_match_single_device(rng):
    """make_sharded_features: per-device shards + psum == one-device append.
    A stub detector keeps the test about the shard_map/psum mechanics."""
    import flax.linen as nn
    from sd_video_gen_tpu.evaluation.fvd import FeatureStats, preprocess_videos
    from sd_video_gen_tpu.evaluation.predict_fvd import make_sharded_features

    class StubDetector(nn.Module):
        @nn.compact
        def __call__(self, x):  # (B, T, 224, 224, 3) -> (B, 400)
            pooled = x.mean(axis=(1, 2, 3))
            return nn.Dense(400)(pooled)

    det = StubDetector()
    videos = jnp.asarray(rng.integers(0, 255, (8, 3, 32, 32, 3))
                         .astype(np.uint8))
    params = det.init(jax.random.PRNGKey(0), preprocess_videos(videos[:1]))

    mesh = make_mesh("data=8,model=1")
    stats = make_sharded_features(det, mesh)(params, videos)

    ref = FeatureStats(400).append(det.apply(params, preprocess_videos(videos)))
    np.testing.assert_allclose(float(stats.n), float(ref.n))
    np.testing.assert_allclose(np.asarray(stats.raw_sum),
                               np.asarray(ref.raw_sum), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats.raw_prod),
                               np.asarray(ref.raw_prod), rtol=1e-5, atol=1e-2)

    mu_s, cov_s = stats.mean_cov()
    mu_r, cov_r = ref.mean_cov()
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_r),
                               rtol=1e-5, atol=1e-5)


def test_sharded_feature_stats_batch_guard(rng):
    import flax.linen as nn
    from sd_video_gen_tpu.evaluation.predict_fvd import make_sharded_features

    class StubDetector(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(400)(x.mean(axis=(1, 2, 3)))

    mesh = make_mesh("data=8,model=1")
    fn = make_sharded_features(StubDetector(), mesh)
    bad = jnp.zeros((6, 3, 32, 32, 3), jnp.uint8)
    try:
        fn({}, bad)
        raised = False
    except ValueError:
        raised = True
    assert raised
