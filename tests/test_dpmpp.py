"""DPM-Solver++(2M) correctness against an analytically-solvable diffusion.

For Gaussian data x0 ~ N(mu, s^2 I) the optimal eps-model is closed-form:
x_t = a x0 + s_t n has marginal N(a mu, a^2 s^2 + s_t^2), so

    eps*(x, t) = s_t * (x - a_t mu) / (a_t^2 s^2 + s_t^2).

With this exact eps the deterministic sampling trajectory is the
probability-flow ODE, whose endpoint we approximate to machine precision
with a 4096-step first-order (DDIM) solve over the same noise interval.
That gives hard numbers for the sampler's claims:

  * 5 DPM-Solver++(2M) steps beat 10 DDIM steps (half the UNet evals),
  * the solver converges at ~2nd order in the step count,
  * its start-level noising matches DDIMSchedule.add_noise_at for the
    same t_start (the partial-denoise handoff contract).
"""

import numpy as np
import pytest

from sd_video_gen_tpu.diffusion.schedulers import (DDIMSchedule,
                                                   DPMSolverPPSchedule,
                                                   _alphas_cumprod)

MU, S = 0.3, 0.5          # data distribution N(mu, s^2)
T_START = 180.0           # = DDIM(50).timesteps[40]: the --denoise tail


def _levels(k, t_start=T_START):
    acp = _alphas_cumprod()
    ts = np.linspace(t_start, 0.0, k + 1)
    acp_t = np.interp(ts, np.arange(len(acp)), acp)
    # exact-x0 endpoint convention: the PRODUCTION DDIM tail ends with
    # set_alpha_to_one (final step emits predicted x0) and r5's dpmpp
    # default is final_sigma_zero=True — the analytic truth and both
    # solver arms must share that convention, or the residual
    # sigma(0)~0.029 shows up as a phantom solver error
    acp_t[-1] = 1.0
    return np.sqrt(acp_t), np.sqrt(1.0 - acp_t)


def _eps_star(x, a, s_t):
    return s_t * (x - a * MU) / (a * a * S * S + s_t * s_t)


def _ddim_solve(x, k):
    """First-order (DDIM eta=0) solve on a k-step linspace grid."""
    a, s_t = _levels(k)
    for i in range(k):
        eps = _eps_star(x, a[i], s_t[i])
        x0 = (x - s_t[i] * eps) / a[i]
        x = a[i + 1] * x0 + s_t[i + 1] * eps
    return x


def _dpmpp_solve(x, k):
    sched = DPMSolverPPSchedule(k, T_START)
    a = np.asarray(sched.alpha)
    s_t = np.asarray(sched.sigma)
    x0_prev = np.zeros_like(x)
    for i in range(k):
        eps = _eps_star(x, a[i], s_t[i])
        x, x0_prev = sched.step(eps, i, x, x0_prev)
        x = np.asarray(x)
    return x


@pytest.fixture(scope="module")
def truth_and_start():
    rng = np.random.default_rng(0)
    a0, s0 = _levels(1)
    x_start = a0[0] * (MU + S * rng.standard_normal(64)) \
        + s0[0] * rng.standard_normal(64)
    return _ddim_solve(x_start, 4096), x_start


def test_5_dpmpp_steps_beat_10_ddim_steps(truth_and_start):
    truth, x_start = truth_and_start
    err_dpmpp5 = np.abs(_dpmpp_solve(x_start, 5) - truth).max()
    err_ddim10 = np.abs(_ddim_solve(x_start, 10) - truth).max()
    assert err_dpmpp5 < err_ddim10, (err_dpmpp5, err_ddim10)


def test_second_order_convergence(truth_and_start):
    truth, x_start = truth_and_start
    e6 = np.abs(_dpmpp_solve(x_start, 6) - truth).max()
    e12 = np.abs(_dpmpp_solve(x_start, 12) - truth).max()
    e24 = np.abs(_dpmpp_solve(x_start, 24) - truth).max()
    # 2nd order => halving h divides the error by ~4 (measured on the
    # lambda grid: 6.1x and 4.8x); allow slack for the first-order
    # first/final transitions
    assert e6 / e12 > 2.5, (e6, e12)
    assert e12 / e24 > 2.5, (e12, e24)


def test_start_noising_matches_ddim_handoff():
    """--denoise_sampler dpmpp must noise the latent to the SAME level the
    DDIM tail would (t_start = DDIM timesteps[start_step]); a mismatch
    silently changes how much of the frame the refiner repaints."""
    ddim = DDIMSchedule(50)
    start_step = 40
    t_start = float(ddim.timesteps[start_step])
    assert t_start == T_START
    sched = DPMSolverPPSchedule(5, t_start)
    x = np.full((3,), 0.7, np.float32)
    n = np.asarray([0.1, -0.4, 1.3], np.float32)
    np.testing.assert_allclose(
        np.asarray(sched.add_noise_at_start(x, n)),
        np.asarray(ddim.add_noise_at(x, n, start_step)), rtol=1e-6)


def test_rejects_single_step():
    with pytest.raises(ValueError):
        DPMSolverPPSchedule(1, T_START)


# ---- nonlinear case: Gaussian MIXTURE data (exact eps, curved drift) ----
# x0 ~ 0.6 N(-0.8, 0.3^2) + 0.4 N(0.9, 0.15^2): the posterior-weighted
# score makes x0(x_t, lambda) genuinely nonlinear, unlike the single-
# Gaussian case whose probability-flow ODE is linear in x.

_W = np.array([0.6, 0.4])
_MUK = np.array([-0.8, 0.9])
_SK = np.array([0.3, 0.15])


def _eps_star_mix(x, a, s_t):
    v = a * a * _SK ** 2 + s_t * s_t
    logp = (-0.5 * (x[..., None] - a * _MUK) ** 2 / v
            - 0.5 * np.log(v) + np.log(_W))
    r = np.exp(logp - logp.max(-1, keepdims=True))
    r /= r.sum(-1, keepdims=True)
    score = (r * (-(x[..., None] - a * _MUK) / v)).sum(-1)
    return -s_t * score


def _ddim_solve_mix(x, k):
    a, s_t = _levels(k)
    for i in range(k):
        eps = _eps_star_mix(x, a[i], s_t[i])
        x0 = (x - s_t[i] * eps) / a[i]
        x = a[i + 1] * x0 + s_t[i + 1] * eps
    return x


def _dpmpp_solve_mix(x, k):
    sched = DPMSolverPPSchedule(k, T_START)
    a = np.asarray(sched.alpha)
    s_t = np.asarray(sched.sigma)
    x0_prev = np.zeros_like(x)
    for i in range(k):
        eps = _eps_star_mix(x, a[i], s_t[i])
        x, x0_prev = sched.step(eps, i, x, x0_prev)
        x = np.asarray(x)
    return x


@pytest.fixture(scope="module")
def mix_truth_and_start():
    rng = np.random.default_rng(0)
    a0, s0 = _levels(1)
    comp = rng.random(256) < _W[1]
    x0s = np.where(comp, _MUK[1] + _SK[1] * rng.standard_normal(256),
                   _MUK[0] + _SK[0] * rng.standard_normal(256))
    x_start = a0[0] * x0s + s0[0] * rng.standard_normal(256)
    return _ddim_solve_mix(x_start, 8192), x_start


# Metric note: samples near the mode-decision boundary have chaotic
# trajectories — ANY coarse solver can land them in the other mode, so the
# max-norm there measures the draw, not the solver (observed: a different
# rng stream pushes dpmpp5's max from 0.047 to 0.39 while p90 stays small).
# Assertions use the 90th-percentile error, which is outlier-robust and
# carries 4x margins on this fixture.
def _p90(err):
    return float(np.quantile(err, 0.9))


def test_mixture_5_dpmpp_steps_beat_10_ddim_steps(mix_truth_and_start):
    truth, x_start = mix_truth_and_start
    err_dpmpp5 = _p90(np.abs(_dpmpp_solve_mix(x_start, 5) - truth))
    err_ddim10 = _p90(np.abs(_ddim_solve_mix(x_start, 10) - truth))
    err_ddim5 = _p90(np.abs(_ddim_solve_mix(x_start, 5) - truth))
    assert err_dpmpp5 < err_ddim10 / 2, (err_dpmpp5, err_ddim10)
    # equal-eval comparison: 2nd order vs 1st order at k=5
    assert err_dpmpp5 < err_ddim5 / 4, (err_dpmpp5, err_ddim5)


def test_mixture_second_order_convergence(mix_truth_and_start):
    truth, x_start = mix_truth_and_start
    e6 = _p90(np.abs(_dpmpp_solve_mix(x_start, 6) - truth))
    e12 = _p90(np.abs(_dpmpp_solve_mix(x_start, 12) - truth))
    e24 = _p90(np.abs(_dpmpp_solve_mix(x_start, 24) - truth))
    assert e6 / e12 > 2.5, (e6, e12)
    # measured 2.57 — the boundary-sample tail flattens the last ratio, so
    # the floor is looser than the Gaussian case's
    assert e12 / e24 > 2.2, (e12, e24)


def test_rejects_zero_start_level():
    """--denoise_start_step at the end of the DDIM grid gives t_start=0:
    a zero-width lambda interval makes every h zero and the 2M ratio
    h_{i-1}/h_i NaN for k >= 3 — must refuse loudly, not emit NaNs."""
    with pytest.raises(ValueError, match="t_start > 0"):
        DPMSolverPPSchedule(3, 0.0)
