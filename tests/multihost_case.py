"""Shared tiny training case for the multi-host integration test.

The SAME function runs (a) in-process on the 8-device virtual mesh and
(b) inside two 4-device worker processes joined by jax.distributed
(tests/multihost_worker.py). Determinism end to end — shared data seed,
shared init seed, same global batch order — makes the two loss trajectories
comparable to float tolerance.
"""

from __future__ import annotations

import jax


def run_case(data_dir: str, process_shard=None, epochs: int = 2,
             mode: str = "ar", native: bool = False):
    from sd_video_gen_tpu.config import Config
    from sd_video_gen_tpu.data import BouncingBallDataset, BatchLoader
    from sd_video_gen_tpu.parallel import make_mesh
    from sd_video_gen_tpu.train.trainer import Trainer

    cfg = Config(config_name="mh", lr=1e-3, batch_size=8, epochs=epochs,
                 frames_per_clip=5, frames_to_predict=2, frame_size=16,
                 dim_model=32, num_heads=4, num_encoder_layers=1,
                 num_decoder_layers=1, dropout_p=0.0, use_mse=True)
    mesh = make_mesh("data=8,model=1")
    trainer = Trainer(cfg, mode=mode, codec_kind="pixel", mesh=mesh,
                      num_classes=64,
                      checkpoint_dir=data_dir + "/ckpt_unused",
                      use_wandb=False)
    ds = BouncingBallDataset(5, 1, data_dir, "train", seed=3)
    if mode == "text":
        # ball's native indices are frame-id ints, out of range for the
        # class table — text mode needs valid class ids per clip
        class LabeledDS:
            def __init__(self, inner):
                self.inner = inner

            def __len__(self):
                return len(self.inner)

            def __getitem__(self, i):
                _, frames = self.inner[i]
                return i % 64, frames

        ds = LabeledDS(ds)
    if native:
        # same contract through the C++ loader: cache pre-built by the
        # parent test (workers only read the mmap)
        import os
        from sd_video_gen_tpu.data.native_loader import NativeBatchLoader
        cache_dir = os.path.join(data_dir, "native_cache")
        loader = NativeBatchLoader(cache_dir, "train", cfg.batch_size,
                                   shuffle=False, seed=7, n_threads=1,
                                   process_shard=process_shard)
    else:
        loader = BatchLoader(ds, cfg.batch_size, shuffle=False, seed=7,
                             process_shard=process_shard)

    rng = jax.random.PRNGKey(0)
    indices, frames = next(iter(loader))
    trainer.init_state(frames, seed=0,
                       sample_text_embeds=trainer._texts(indices))
    losses = []
    for _ in range(epochs):
        m = trainer.train_loop(loader, rng)
        losses.append(m["total_train"])
    return losses
