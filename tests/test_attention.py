"""Pallas flash attention vs einsum oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sd_video_gen_tpu.ops.attention import (flash_attention,
                                            reference_attention, attention)


@pytest.mark.parametrize("T,d,bq,bk", [(256, 64, 128, 128), (512, 40, 256, 256),
                                       (128, 128, 128, 64)])
def test_flash_matches_reference(rng, T, d, bq, bk):
    q = jnp.asarray(rng.standard_normal((2, T, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, T, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, T, d)), jnp.float32)
    ref = reference_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16(rng):
    q = jnp.asarray(rng.standard_normal((1, 256, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 256, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 256, 64)), jnp.bfloat16)
    ref = reference_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=0.05,
                               atol=0.05)


def test_flash_extreme_logits_stable(rng):
    """Online softmax must survive large-magnitude logits."""
    q = jnp.asarray(rng.standard_normal((1, 256, 32)) * 30, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 256, 32)) * 30, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 256, 32)), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_dispatch_fallback_on_cpu(rng):
    q = jnp.asarray(rng.standard_normal((1, 2048, 32)), jnp.float32)
    out = attention(q, q, q)  # CPU backend -> einsum path, no crash
    assert out.shape == q.shape


def test_dispatch_policy_matches_measurements():
    """Policy pinned to the v5e timing table in PARITY.md (kernel wins)."""
    from sd_video_gen_tpu.ops.attention import should_use_flash, auto_blocks
    # the policy is dtype-agnostic (both dtypes win at the hot shape)
    assert should_use_flash((8, 4096, 40), True)        # 1.25-1.45x win
    assert not should_use_flash((8, 1024, 80), True)    # noise-level
    assert should_use_flash((64, 1024, 80), True)       # 1.12x at BH=64
    assert not should_use_flash((64, 256, 160), True)   # tie at 256
    assert not should_use_flash((1, 4096, 512), True)   # d too wide
    assert not should_use_flash((8, 4096, 40), False)   # not on TPU
    # block policy: big tiles for narrow heads, VMEM-safe for wide ones
    assert auto_blocks(4096, 40) == (1024, 1024)
    assert auto_blocks(4096, 512) == (256, 256)
    assert auto_blocks(256, 40) == (256, 256)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="non-interpret Pallas parity needs a real TPU")
def test_flash_on_tpu_4096(rng):
    """On-chip (non-interpret) parity at the 512px UNet denoise shape."""
    shape = (8, 4096, 40)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
               for _ in range(3))
    out = flash_attention(q, k, v)
    ref = reference_attention(q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 5e-2, err


def test_head_sharded_matches_reference(rng):
    """TP attention: shard_map over the model axis splits the head-batch;
    per-shard flash (interpret) and per-shard dispatch must both equal the
    single-device einsum oracle."""
    from sd_video_gen_tpu.ops.attention import head_sharded_attention
    from sd_video_gen_tpu.parallel import make_mesh

    q = jnp.asarray(rng.standard_normal((16, 128, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((16, 128, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((16, 128, 32)), jnp.float32)
    ref = reference_attention(q, k, v)
    mesh = make_mesh("data=1,model=8")
    for force in (None, "flash_interpret"):
        # fresh lambda per force: jax.jit(attention) would cache-hit the
        # previous force's trace (the context is trace-time state, not part
        # of the jit cache key) and never exercise the interpret path
        with head_sharded_attention(mesh, force=force):
            out = jax.jit(lambda a, b, c: attention(a, b, c))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_head_sharded_falls_through(rng):
    """Non-divisible head-batch and cross-attention shapes skip the
    shard_map and still compute correctly under an active context."""
    from sd_video_gen_tpu.ops.attention import head_sharded_attention
    from sd_video_gen_tpu.parallel import make_mesh

    mesh = make_mesh("data=1,model=8")
    q = jnp.asarray(rng.standard_normal((3, 128, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 128, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, 128, 32)), jnp.float32)
    with head_sharded_attention(mesh):
        out = jax.jit(attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(reference_attention(q, k, v)),
                               rtol=2e-5, atol=2e-5)
    # cross-attention: kv sequence differs from q sequence
    kx = jnp.asarray(rng.standard_normal((16, 7, 32)), jnp.float32)
    vx = jnp.asarray(rng.standard_normal((16, 7, 32)), jnp.float32)
    qx = jnp.asarray(rng.standard_normal((16, 128, 32)), jnp.float32)
    with head_sharded_attention(mesh):
        out = jax.jit(attention)(qx, kx, vx)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(reference_attention(qx, kx, vx)),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_matches_reference(rng):
    """Sequence-parallel ring attention (k/v blocks rotating via ppermute,
    online softmax) must equal the einsum oracle — the path for attention a
    head split cannot touch (the VAE's single-head 4096-token mid block)."""
    from sd_video_gen_tpu.ops.attention import _ring_attention
    from sd_video_gen_tpu.parallel import make_mesh

    mesh = make_mesh("data=1,model=8")
    q = jnp.asarray(rng.standard_normal((2, 512, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 512, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 512, 16)), jnp.float32)
    out = _ring_attention(q, k, v, None, mesh, "model")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(reference_attention(q, k, v)),
                               rtol=2e-5, atol=2e-5)
    # online-softmax stability at extreme logits (same property the flash
    # kernel tests assert)
    out = _ring_attention(q * 100, k * 100, v, None, mesh, "model")
    assert np.isfinite(np.asarray(out)).all()


def test_ring_engages_for_single_head_long_seq(rng, monkeypatch):
    """Under the TP context, a head-batch that cannot split but a token axis
    that can -> ring attention; verify the dispatch routes there AND the
    result matches (threshold lowered so the CPU-size case engages)."""
    import sd_video_gen_tpu.ops.attention as A
    from sd_video_gen_tpu.parallel import make_mesh

    mesh = make_mesh("data=1,model=8")
    q = jnp.asarray(rng.standard_normal((1, 256, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 256, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 256, 16)), jnp.float32)
    ref = reference_attention(q, k, v)

    monkeypatch.setattr(A, "RING_MIN_TOKENS", 32)  # T=256 / 8 devices
    called = {}
    real_ring = A._ring_attention

    def spy(*a, **kw):
        called["ring"] = True
        return real_ring(*a, **kw)

    monkeypatch.setattr(A, "_ring_attention", spy)
    with A.head_sharded_attention(mesh):
        out = A.attention(q, k, v)
    assert called.get("ring"), "ring path did not engage"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # below the token threshold: falls through to the plain dispatch
    called.clear()
    with A.head_sharded_attention(mesh):
        out = A.attention(q[:, :64], k[:, :64], v[:, :64])
    assert "ring" not in called


def test_flash_rejects_nondivisible_tokens(rng):
    """Forced-flash callers bypass the dispatch guard; the kernel wrapper
    must refuse token counts the grid would truncate (tail rows were left
    uninitialized — review regression)."""
    import pytest
    # auto_blocks clamps to T when T < 1024, so force a smaller block to
    # hit the truncating-grid case (and T=2304 with auto 1024 blocks is the
    # real-world 384px shape that triggered it)
    q = jnp.asarray(rng.standard_normal((1, 300, 32)), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        flash_attention(q, q, q, block_q=256, block_k=256, interpret=True)
