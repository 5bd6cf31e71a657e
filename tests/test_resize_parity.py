"""Resize-semantics parity: eval preprocessing must match torch interpolate
(the published-FVD convention), not jax's antialiased default."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from sd_video_gen_tpu.evaluation.fvd import preprocess_videos


def test_fvd_preprocess_matches_torch_bilinear(rng):
    # downsample case: 448x672 -> shorter side 224 (this is where jax's
    # antialias default diverges by up to ~80/255)
    v = rng.integers(0, 255, (1, 2, 448, 672, 3)).astype(np.uint8)
    ours = np.asarray(preprocess_videos(jnp.asarray(v)))  # (1,2,224,224,3)

    x = torch.tensor(v.astype(np.float32)).reshape(2, 448, 672, 3)
    x = x.permute(0, 3, 1, 2)
    x = F.interpolate(x, (224, 336), mode="bilinear", align_corners=False)
    left = (336 - 224) // 2
    x = x[:, :, :, left:left + 224]
    ref = (x.permute(0, 2, 3, 1).numpy() / 127.5 - 1.0)[None]
    np.testing.assert_allclose(ours, ref.reshape(1, 2, 224, 224, 3),
                               rtol=1e-4, atol=1e-4)
