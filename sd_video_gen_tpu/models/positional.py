"""Sinusoidal positional encodings.

Reference: models/positional_encoding.py:17-35 — standard sin/cos table with
max_len window; added to scaled token embeddings, followed by dropout.
"""

import numpy as np
import jax.numpy as jnp


def sinusoidal_positions(max_len: int, dim: int) -> jnp.ndarray:
    """(max_len, dim) table: even dims sin(pos * exp(-log(1e4) * 2i/dim)), odd cos.

    Built in numpy (static under jit) with float32, matching the reference
    formula exactly including its use of the *even-index* frequency for the
    paired cos channel.
    """
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * (-np.log(10000.0) / dim))
    table = np.zeros((max_len, dim), dtype=np.float32)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div[: table[:, 1::2].shape[1]])
    return jnp.asarray(table)
