"""Scheduler golden tests: DDIM/LMS vs independent numpy implementations of
the published update rules, plus analytic sanity properties."""

import numpy as np
import jax.numpy as jnp

from sd_video_gen_tpu.diffusion.schedulers import (DDIMSchedule, LMSSchedule,
                                                   _alphas_cumprod)


def test_beta_schedule_values():
    acp = _alphas_cumprod()
    # scaled_linear endpoints
    assert abs((1 - acp[0]) - 0.00085) < 1e-6
    assert 0 < acp[-1] < 0.01  # heavily noised at t=999
    assert np.all(np.diff(acp) < 0)


def test_ddim_timesteps_layout():
    s = DDIMSchedule(num_inference_steps=50)
    assert list(s.timesteps[:3]) == [980, 960, 940]
    assert s.timesteps[-1] == 0
    assert float(s.alpha_prev[-1]) == 1.0  # set_alpha_to_one


def test_ddim_perfect_eps_recovers_x0(rng):
    """With the true eps, iterating all DDIM steps returns exactly x0."""
    s = DDIMSchedule(num_inference_steps=10, clip_sample=False)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 4, 4)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 4, 4)), jnp.float32)
    x = s.add_noise_at(x0, noise, 0)
    for i in range(10):
        a_t = s.alpha[i]
        # true eps for the current x given x0: eps = (x - sqrt(a)x0)/sqrt(1-a)
        eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        x = s.step(eps, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddim_step_matches_formula(rng):
    s = DDIMSchedule(num_inference_steps=50, clip_sample=True)
    x = rng.standard_normal((1, 8)).astype(np.float32)
    eps = rng.standard_normal((1, 8)).astype(np.float32)
    i = 7
    a_t, a_p = float(s.alpha[i]), float(s.alpha_prev[i])
    x0 = np.clip((x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t), -1, 1)
    expect = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    got = np.asarray(s.step(jnp.asarray(eps), i, jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_ddim_add_noise_snr():
    s = DDIMSchedule(num_inference_steps=50)
    x = jnp.ones((4,))
    z = jnp.zeros((4,))
    # noising with zero noise scales by sqrt(alpha)
    out = s.add_noise_at(x, z, 10)
    np.testing.assert_allclose(float(out[0]), float(jnp.sqrt(s.alpha[10])),
                               rtol=1e-6)


def test_lms_sigma_grid():
    s = LMSSchedule(num_inference_steps=50)
    sig = np.asarray(s.sigmas)
    assert sig.shape == (51,)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig[:-1]) < 0)  # descending
    # sigma[0] corresponds to t=999: sqrt((1-acp)/acp)
    acp = _alphas_cumprod()
    np.testing.assert_allclose(sig[0], np.sqrt((1 - acp[-1]) / acp[-1]),
                               rtol=1e-5)


def test_lms_coeffs_sum_to_dsigma():
    """Lagrange basis integrates to 1 over the interval: sum_k coeff[i,k] =
    sigma[i+1]-sigma[i] for any fully-ordered step."""
    s = LMSSchedule(num_inference_steps=20)
    sig = np.asarray(s.sigmas)
    coeffs = np.asarray(s.coeffs)
    for i in range(20):
        np.testing.assert_allclose(coeffs[i].sum(), sig[i + 1] - sig[i],
                                   rtol=1e-4, atol=1e-6)


def test_lms_linear_problem_exact(rng):
    """For eps independent of x (constant derivative field), LMS order>=1 is
    exact: stepping with constant eps moves x by (sigma_next-sigma_i)*eps."""
    s = LMSSchedule(num_inference_steps=10)
    x = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
    hist = s.init_history(x)
    x1, hist = s.step(eps, 0, x, hist)
    dsig = float(s.sigmas[1] - s.sigmas[0])
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x + dsig * eps),
                               rtol=1e-4, atol=1e-5)


def test_lms_full_loop_denoises(rng):
    """Full LMS loop with the true-eps oracle drives x back to ~x0."""
    S = 25
    s = LMSSchedule(num_inference_steps=S)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 4)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    x = x0 + noise * s.sigmas[0]
    hist = s.init_history(x)
    for i in range(S):
        eps = (x - x0) / s.sigmas[i]  # oracle eps under sigma-parameterization
        x, hist = s.step(eps, i, x, hist)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_ddim_nondivisor_steps_runs_full_array():
    """When S doesn't divide 1000 the 0.2.3-era timesteps array is LONGER
    than S (arange semantics); loops must iterate the array, not range(S),
    or the final low-noise step is skipped (review regression)."""
    s = DDIMSchedule(7)
    assert s.n_steps == len(s.timesteps) == 8  # arange(0,1000,142) -> 8
    assert s.timesteps[-1] == 0                # final step reaches t=0
    assert len(s.alpha) == len(s.alpha_prev) == 8
    # divisor case unchanged
    assert DDIMSchedule(10).n_steps == 10
