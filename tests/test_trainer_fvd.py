"""In-training FVD hook (trainer_fvd role): runs with short clips, fires on
the right epochs."""

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.config import Config
from sd_video_gen_tpu.data import (BouncingBallDataset, BatchLoader,
                                   generate_bouncing_ball_tree)
from sd_video_gen_tpu.train.trainer import Trainer
from sd_video_gen_tpu.parallel import make_mesh


def test_fvd_validation_short_clips(tmp_path):
    root = generate_bouncing_ball_tree(str(tmp_path / "d"), 2, 2, 10, 32)
    cfg = Config(config_name="fvdtiny", lr=1e-3, batch_size=2, epochs=1,
                 frames_per_clip=5, frames_to_predict=2, frame_size=32,
                 dim_model=32, num_heads=4, num_encoder_layers=1,
                 num_decoder_layers=1, dropout_p=0.0, use_contrastive=False)
    mesh = make_mesh("data=1,model=1", devices=jax.devices()[:1])
    trainer = Trainer(cfg, mode="ar", mesh=mesh,
                      checkpoint_dir=str(tmp_path / "ckpt"), use_wandb=False)
    tl = BatchLoader(BouncingBallDataset(5, 1, root, "train"), 2, seed=1)
    vl = BatchLoader(BouncingBallDataset(5, 1, root, "test"), 2, seed=1)

    # Stub feature extractor with the I3D call signature: running the real
    # 224px I3D on the 1-core CPU test host takes minutes per batch; its
    # numerics are covered in test_fvd / test_full_scale_shapes.
    import flax.linen as nn

    class StubI3D(nn.Module):
        @nn.compact
        def __call__(self, videos):
            pooled = videos.mean(axis=(1, 2, 3))  # (B, 3)
            return nn.Dense(400)(pooled)

    i3d = StubI3D()
    i3d_params = i3d.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 9, 224, 224, 3)))
    hist = trainer.fit(tl, vl, epochs=1, fvd_every=1,
                       fvd_i3d=(i3d, i3d_params))
    # k=2 (<9 frame minimum) works via temporal padding; score is finite
    assert "FVD score" in hist[0]
    assert np.isfinite(hist[0]["FVD score"])

    # Reference full-clip protocol (trainer_fvd.py:253-273): teacher-forced
    # predictions at every position vs the whole GT clip. Scores must be
    # finite and generally differ from the last_k protocol (different
    # frame statistics enter the Frechet computation).
    ref = trainer.fvd_validation(vl, i3d, i3d_params, protocol="reference")
    assert np.isfinite(ref)
    lk = trainer.fvd_validation(vl, i3d, i3d_params, protocol="last_k")
    assert np.isfinite(lk)
    assert ref != lk


def test_fvd_validation_text_mode(tmp_path):
    """Text-conditioned models must get their text embeddings inside the
    FVD hook too (regression: fvd_batch called the model without
    text_embeds and FrameTransformer raised inside the jit trace)."""
    root = generate_bouncing_ball_tree(str(tmp_path / "d"), 2, 2, 10, 32)
    cfg = Config(config_name="fvdtext", lr=1e-3, batch_size=2, epochs=1,
                 frames_per_clip=5, frames_to_predict=2, frame_size=32,
                 dim_model=32, num_heads=4, num_encoder_layers=1,
                 num_decoder_layers=1, dropout_p=0.0, use_contrastive=False)
    mesh = make_mesh("data=1,model=1", devices=jax.devices()[:1])
    trainer = Trainer(cfg, mode="text", mesh=mesh, num_classes=16,
                      checkpoint_dir=str(tmp_path / "ckpt"), use_wandb=False)

    class LabeledDS:
        """Ball clips with VALID class ids (ball's own indices are frame-id
        ints, out of range for a 16-class table — the host-side lookup is
        strict where the old device gather silently clipped)."""

        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            _, frames = self.ds[i]
            return i % 16, frames

    vl = BatchLoader(LabeledDS(BouncingBallDataset(5, 1, root, "test")), 2,
                     seed=1)

    import flax.linen as nn

    class StubI3D(nn.Module):
        @nn.compact
        def __call__(self, videos):
            return nn.Dense(400)(videos.mean(axis=(1, 2, 3)))

    i3d = StubI3D()
    i3d_params = i3d.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 9, 224, 224, 3)))
    indices, frames = next(iter(vl))
    trainer.init_state(frames, 0, trainer._texts(indices))
    for protocol in ("last_k", "reference"):
        score = trainer.fvd_validation(vl, i3d, i3d_params,
                                       protocol=protocol)
        assert np.isfinite(score)
