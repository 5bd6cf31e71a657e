"""Copy-last-frame baseline with the transformer's call signature.

Reference: models/identity.py:13-16 — returns the last src frame; used by the
naive-prediction and naive-FVD control experiments.
"""

import flax.linen as nn
import jax.numpy as jnp


class IdentityModel(nn.Module):
    @nn.compact
    def __call__(self, src, tgt, tgt_mask=None, text_embeds=None,
                 deterministic: bool = True):
        # Predict next frame == last input frame, broadcast over tgt length.
        last = src[:, -1:, :]
        return jnp.broadcast_to(last, (src.shape[0], tgt.shape[1], src.shape[-1])
                                ).astype(jnp.float32)
