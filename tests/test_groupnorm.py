"""Fused GroupNorm+SiLU kernel vs flax GroupNorm oracle."""

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from sd_video_gen_tpu.ops.groupnorm import (groupnorm_silu_pallas,
                                            groupnorm_silu_reference,
                                            groupnorm_silu)


@pytest.mark.parametrize("B,H,W,C,G", [(2, 8, 8, 16, 4), (1, 4, 4, 32, 32)])
def test_reference_matches_flax(rng, B, H, W, C, G):
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C), jnp.float32)
    gn = nn.GroupNorm(num_groups=G, epsilon=1e-6)
    params = {"params": {"scale": scale, "bias": bias}}
    ref = jax.nn.silu(gn.apply(params, x))
    ours = groupnorm_silu_reference(x, scale, bias, G)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("silu", [True, False])
def test_pallas_matches_reference(rng, silu):
    B, H, W, C, G = 2, 8, 8, 32, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C), jnp.float32)
    ref = groupnorm_silu_reference(x, scale, bias, G, silu=silu)
    out = groupnorm_silu_pallas(x, scale, bias, G, silu=silu, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_dispatch_cpu_fallback(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
    out = groupnorm_silu(x, jnp.ones(8), jnp.zeros(8), 2)
    assert out.shape == x.shape
