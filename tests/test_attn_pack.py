"""Block-diagonal attention packing (tools/bench_train_attn.py) must be
numerically identical to per-clip attention — the MXU-fill experiment only
means anything if the packed variant computes the same function."""

import numpy as np
import jax.numpy as jnp

from tools.bench_train_attn import plain_attention, packed_attention


def _qkv(rng, B=8, T=10, H=4, hd=16):
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    return mk(), mk(), mk()


def test_packed_matches_plain_unmasked(rng):
    q, k, v = _qkv(rng)
    ref = plain_attention(q, k, v)
    for pack in (2, 4, 8):
        out = packed_attention(q, k, v, pack)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_packed_matches_plain_causal(rng):
    q, k, v = _qkv(rng)
    T = q.shape[1]
    mask = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -jnp.inf)
    ref = plain_attention(q, k, v, mask)
    out = packed_attention(q, k, v, 4, mask)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_packed_no_cross_clip_leak(rng):
    """Changing clip j's keys must not move clip i's output."""
    q, k, v = _qkv(rng, B=4)
    base = packed_attention(q, k, v, 4)
    k2 = k.at[3].set(k[3] * 100.0)
    v2 = v.at[3].set(v[3] - 7.0)
    out = packed_attention(q, k2, v2, 4)
    np.testing.assert_allclose(np.asarray(out[:3]), np.asarray(base[:3]),
                               rtol=1e-6, atol=1e-7)
