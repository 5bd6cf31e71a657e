"""Attention masks (additive, XLA-friendly: built once per shape at trace time)."""

import jax.numpy as jnp
import numpy as np


def causal_mask(size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask: 0 on/below the diagonal, -inf above.

    Matches the reference's ``Transformer.get_tgt_mask`` (models/transformer.py:70-89):
    row i may attend to positions <= i. Built with numpy since ``size`` is static
    under jit.
    """
    m = np.triu(np.full((size, size), -np.inf, dtype=np.float32), k=1)
    return jnp.asarray(m, dtype=dtype)
