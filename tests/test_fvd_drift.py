"""Long-stream FVD accumulation accuracy (VERDICT r3 weak #7).

The shipped streaming architecture keeps PER-BATCH (n, Σx, Σxxᵀ) stats in
f32 inside jit (TPU has no native f64) and upgrades to f64 at the host
merge (evaluation/fvd.py FeatureStats.append/merge). The worry: I3D logits
are offset from zero, so Σxxᵀ entries grow ~n·(offset²) and the final
population-covariance subtraction cancels most of f32's ~7 digits.

This test quantifies it against an ANALYTIC ground truth: two 10⁴-sample
Gaussian streams with known means/diagonal covariances, whose Fréchet
distance is closed-form. It asserts the shipped per-batch-f32 + host-f64
path stays within a tight relative bound, and demonstrates the bound the
all-f32 alternative would violate (the reason the host merge upgrades).
"""

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.evaluation.fvd import FeatureStats, compute_fvd

DIM = 64
N = 10_000
BATCH = 50
OFFSET = 10.0  # I3D logits are not zero-centered; stress the cancellation


def _analytic_fvd(mu1, var1, mu2, var2):
    """Fréchet distance between diagonal Gaussians:
    |mu1-mu2|^2 + Σ (sqrt(v1) - sqrt(v2))^2."""
    return float(np.sum((mu1 - mu2) ** 2)
                 + np.sum((np.sqrt(var1) - np.sqrt(var2)) ** 2))


def _streams(rng):
    mu1 = np.full(DIM, OFFSET)
    mu2 = np.full(DIM, OFFSET + 0.5)
    var1 = np.linspace(0.5, 2.0, DIM)
    var2 = np.linspace(1.0, 1.5, DIM)
    x = rng.standard_normal((N, DIM)) * np.sqrt(var1) + mu1
    y = rng.standard_normal((N, DIM)) * np.sqrt(var2) + mu2
    return (x.astype(np.float32), y.astype(np.float32),
            mu1, var1, mu2, var2)


def _sample_fvd(x, y):
    """f64 reference FVD of the actual SAMPLES (isolates accumulation error
    from sampling error)."""
    def mc(a):
        a = np.asarray(a, np.float64)
        mu = a.mean(0)
        return mu, a.T @ a / len(a) - np.outer(mu, mu)
    m1, c1 = mc(x)
    m2, c2 = mc(y)
    from sd_video_gen_tpu.evaluation.fvd import trace_sqrt_product
    return float(np.sum((m1 - m2) ** 2) + np.trace(c1) + np.trace(c2)
                 - 2 * trace_sqrt_product(c1, c2))


def _stream_shipped(feats):
    """The shipped path: per-batch stats computed in f32 INSIDE jit, merged
    on host (f64 upgrade happens in merge)."""
    @jax.jit
    def batch_stats(f):
        st = FeatureStats(DIM).append(f)
        return st.n, st.raw_sum, st.raw_prod

    total = FeatureStats(DIM)
    for i in range(0, len(feats), BATCH):
        n, s, p = batch_stats(jnp.asarray(feats[i:i + BATCH]))
        total = total.merge(FeatureStats(DIM, np.asarray(n),
                                         np.asarray(s), np.asarray(p)))
    return total


def _stream_all_f32(feats):
    """The architecture we REJECTED: f32 accumulators across the whole
    stream (what keeping the running stats on-device would do)."""
    n = np.float32(0)
    s = np.zeros(DIM, np.float32)
    p = np.zeros((DIM, DIM), np.float32)
    for i in range(0, len(feats), BATCH):
        f = feats[i:i + BATCH].astype(np.float32)
        n += np.float32(f.shape[0])
        s += f.sum(0, dtype=np.float32)
        p += (f.T @ f).astype(np.float32)
    return FeatureStats(DIM, n, s, p)


def test_shipped_streaming_matches_analytic_at_10k():
    rng = np.random.default_rng(0)
    x, y, mu1, var1, mu2, var2 = _streams(rng)
    analytic = _analytic_fvd(mu1, var1, mu2, var2)
    sample_ref = _sample_fvd(x, y)
    # sampling error at N=10^4 is itself a few percent — the analytic check
    # only anchors the order of magnitude
    assert abs(sample_ref - analytic) / analytic < 0.10

    st_x = _stream_shipped(x)
    st_y = _stream_shipped(y)
    fvd = compute_fvd(st_x, st_y)
    # accumulation error of the shipped path vs the f64 sample truth:
    # per-batch f32 with offset-10 logits keeps ~5 digits; the host merge
    # is exact f64. Documented bound: <0.1% relative.
    rel = abs(fvd - sample_ref) / sample_ref
    assert rel < 1e-3, f"shipped-path accumulation error {rel:.2e}"


def test_all_f32_accumulation_is_why_host_merge_upgrades():
    """The all-f32 stream loses enough digits at 10⁴ offset samples to
    visibly move FVD — this is the measured justification for the f64 host
    merge (and the retirement of the old 'use the batch API past 100K
    clips' guidance: the shipped path no longer degrades with length)."""
    rng = np.random.default_rng(1)
    x, y, *_ = _streams(rng)
    sample_ref = _sample_fvd(x, y)

    fvd_f32 = compute_fvd(_stream_all_f32(x), _stream_all_f32(y))
    fvd_shipped = compute_fvd(_stream_shipped(x), _stream_shipped(y))
    err_f32 = abs(fvd_f32 - sample_ref) / sample_ref
    err_shipped = abs(fvd_shipped - sample_ref) / sample_ref
    # the shipped path must be at least 10x more accurate than all-f32;
    # both absolute claims are also pinned so a silent regression in either
    # direction trips
    assert err_shipped < 1e-3
    assert err_f32 > 10 * err_shipped, (
        f"all-f32 err {err_f32:.2e} vs shipped {err_shipped:.2e} — if f32 "
        "got this accurate, the test setup stopped stressing cancellation")


def test_single_batch_f32_bound():
    """Per-batch f32 (the part that MUST stay f32 on TPU) at the realistic
    serving batch (<=64 clips): relative accumulator error < 1e-4, so the
    in-jit stage never dominates the merged result's error."""
    rng = np.random.default_rng(2)
    f = (rng.standard_normal((64, DIM)) + OFFSET).astype(np.float32)

    @jax.jit
    def batch_stats(f):
        st = FeatureStats(DIM).append(f)
        return st.raw_prod

    p32 = np.asarray(batch_stats(jnp.asarray(f)), np.float64)
    p64 = f.astype(np.float64).T @ f.astype(np.float64)
    rel = np.max(np.abs(p32 - p64) / np.maximum(np.abs(p64), 1e-9))
    assert rel < 1e-4, f"per-batch f32 Σxxᵀ error {rel:.2e}"
