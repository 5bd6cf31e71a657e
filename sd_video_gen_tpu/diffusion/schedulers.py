"""Diffusion schedulers as precomputed-constant, lax.scan-friendly steppers.

The reference drives two schedulers from diffusers 0.2.3:
  - LMSDiscreteScheduler for full text-to-image denoising
    (utils/sd_utils.py:70-72, 97-126): sigma-space scaling, 4th-order
    linear-multistep coefficients from integrated Lagrange polynomials.
  - DDIMScheduler for img2img partial denoising (utils/sd_utils.py:232-260):
    ``add_noise`` at ``timesteps[start_step]`` then stepping from
    ``start_step`` (eta=0, clip_sample, set_alpha_to_one).

TPU-first design: every per-step constant (timesteps, alphas, sigmas, LMS
coefficients) is precomputed on host into dense arrays at construction; the
``step`` functions are pure index-gathered math, so an entire denoise loop
compiles into one lax.scan with zero host round-trips (the reference ran a
Python loop with a host sync per UNet call).

beta schedule: 'scaled_linear' — betas = linspace(sqrt(b0), sqrt(b1), N)^2.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _alphas_cumprod(num_train_timesteps=1000, beta_start=0.00085,
                    beta_end=0.012):
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


class DDIMSchedule:
    """Deterministic DDIM (eta=0) with 0.2.3-era defaults.

    All arrays are indexed by inference-step index i (0 = most noisy).
    """

    def __init__(self, num_inference_steps=50, num_train_timesteps=1000,
                 beta_start=0.00085, beta_end=0.012, clip_sample=True,
                 set_alpha_to_one=True):
        acp = _alphas_cumprod(num_train_timesteps, beta_start, beta_end)
        self.num_inference_steps = num_inference_steps
        step = num_train_timesteps // num_inference_steps
        # timesteps = arange(0, N, N//S) reversed (diffusers 0.2.3 semantics).
        # NB: when S does not divide N this array is LONGER than S (e.g.
        # S=7 -> 8 entries); diffusers iterates the array, not range(S), so
        # loops must run n_steps iterations or they skip the final
        # low-noise step(s).
        timesteps = np.arange(0, num_train_timesteps, step)[::-1].copy()
        self.timesteps = timesteps
        self.n_steps = len(timesteps)
        prev_timesteps = timesteps - step
        final_alpha = 1.0 if set_alpha_to_one else acp[0]
        self.alpha = jnp.asarray(acp[timesteps], jnp.float32)
        self.alpha_prev = jnp.asarray(
            np.where(prev_timesteps >= 0, acp[np.clip(prev_timesteps, 0, None)],
                     final_alpha), jnp.float32)
        self.clip_sample = clip_sample

    def add_noise_at(self, x, noise, i: int):
        """Forward-noise x to the noise level of inference step i
        (DDIMScheduler.add_noise at timesteps[start_step])."""
        a = self.alpha[i]
        return jnp.sqrt(a) * x + jnp.sqrt(1.0 - a) * noise

    def step(self, eps, i, x):
        """One reverse step at inference index i (jittable; i may be traced)."""
        a_t = self.alpha[i]
        a_prev = self.alpha_prev[i]
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
            # re-derive eps from the clipped x0 (diffusers recomputes the
            # direction with the *same* eps; with clipping the standard
            # formulation keeps eps and only clips x0)
        direction = jnp.sqrt(1.0 - a_prev) * eps
        return jnp.sqrt(a_prev) * x0 + direction


class DPMSolverPPSchedule:
    """DPM-Solver++(2M): 2nd-order multistep solver in data-prediction form
    (Lu et al. 2022, arXiv:2211.01095) — the opt-in FAST sampler for the
    partial-denoise path. NOT a reference-parity component (the reference
    ships only diffusers-0.2.3 DDIM/LMS — utils/sd_utils.py:70-72,232-260);
    it exists because the 10-step DDIM tail dominates the north-star
    pipeline's cost and a 2nd-order solver reaches comparable ODE accuracy
    in ~half the UNet evaluations.

    Covers the same noise interval as the DDIM tail it replaces: construct
    with ``t_start`` = the DDIM grid's ``timesteps[start_step]`` and
    ``num_steps`` solver steps; the ``num_steps + 1`` level grid is
    UNIFORM IN LAMBDA (half-logSNR) from lambda(t_start) to lambda(0) —
    the paper's recommended spacing, and decisively better than uniform-t
    here (measured on the analytic Gaussian case in tests/test_dpmpp.py:
    5 lambda-spaced solver steps reach 2.5x lower ODE error than the
    10-step uniform-t DDIM tail; 5 t-spaced steps do NOT beat it).

    All per-transition coefficients are precomputed dense arrays; ``step``
    is pure gather-math, so the whole solve compiles into one lax.scan
    (house scheduler contract). The final transition drops to 1st order
    (``lower_order_final`` — diffusers' stability default for small step
    counts; costs ~30% accuracy on the analytic case but avoids 2nd-order
    extrapolation into the t=0 boundary on real models).

    Endpoint (``final_sigma_zero=True``, the default): the final
    transition emits the exact x0 prediction — the grid's last level is
    forced to (alpha=1, sigma=0), matching BOTH DDIMSchedule's
    set_alpha_to_one endpoint and diffusers' modern
    ``final_sigmas_type="zero"`` DPMSolverMultistep default. Without it
    (``final_sigma_zero=False``, the pre-r5 behavior and diffusers'
    legacy "sigma_min" mode) the output retains the trained schedule's
    residual sigma(0) ~= 0.029 — a systematic offset vs the DDIM tail
    that dominated the measured random-UNet drift (plateau at
    ~sigma_end/||x||) before r5. x0 is still not clipped per step
    (DDIM clips to [-1, 1]; matches diffusers dpmpp). The start-level
    handoff (add_noise_at_start) is pinned equal to DDIM's add_noise_at
    by test (tests/test_dpmpp.py).
    """

    def __init__(self, num_steps: int, t_start: float,
                 num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, final_sigma_zero: bool = True):
        if num_steps < 2:
            raise ValueError("DPM-Solver++(2M) needs num_steps >= 2")
        if not t_start > 0:
            # a zero-width lambda interval makes every h zero -> the 2M
            # ratio h_{i-1}/h_i is NaN for k >= 3 and the solve is a no-op
            # anyway (nothing left to denoise)
            raise ValueError(
                f"DPM-Solver++ needs t_start > 0 (got {t_start}): a "
                "start_step at the end of the DDIM grid leaves no noise "
                "interval to solve — drop --denoise instead")
        acp = _alphas_cumprod(num_train_timesteps, beta_start, beta_end)
        t_all = np.arange(num_train_timesteps, dtype=np.float64)
        lam_all = 0.5 * np.log(acp) - 0.5 * np.log1p(-acp)  # increasing as t->0
        lam = np.linspace(np.interp(float(t_start), t_all, lam_all),
                          lam_all[0], num_steps + 1)
        # t for the eps-model conditioning (lam_all decreases with t: reverse
        # for np.interp's ascending-x contract)
        ts = np.interp(lam, lam_all[::-1], t_all[::-1])
        a2 = 1.0 / (1.0 + np.exp(-2.0 * lam))     # alpha_t^2 = sigmoid(2 lam)
        alpha = np.sqrt(a2)                       # VP alpha_t
        sigma = np.sqrt(1.0 - a2)                 # VP sigma_t
        h = lam[1:] - lam[:-1]                    # (k,) > 0

        # x_{i+1} = c_x[i] * x + c_d[i] * D_i
        c_x = sigma[1:] / sigma[:-1]
        c_d = -alpha[1:] * np.expm1(-h)
        # D_i = w_cur[i] * x0_i + w_prev[i] * x0_{i-1}
        r = np.ones(num_steps)
        r[1:] = h[:-1] / h[1:]
        w_cur = 1.0 + 1.0 / (2.0 * r)
        w_prev = -1.0 / (2.0 * r)
        w_cur[0], w_prev[0] = 1.0, 0.0            # no history yet
        w_cur[-1], w_prev[-1] = 1.0, 0.0          # lower_order_final
        if final_sigma_zero:
            # last level -> (alpha=1, sigma=0): x_next = 0*x + 1*x0, the
            # exact-x0 endpoint (see class docstring). The eps-model eval
            # levels ts[:-1] are untouched — same UNet cost either way.
            alpha[-1], sigma[-1] = 1.0, 0.0
            c_x[-1], c_d[-1] = 0.0, 1.0
        self.num_steps = num_steps
        self.timesteps = ts[:-1]                  # t_i fed to the eps model
        self.alpha = jnp.asarray(alpha, jnp.float32)
        self.sigma = jnp.asarray(sigma, jnp.float32)
        self._c_x = jnp.asarray(c_x, jnp.float32)
        self._c_d = jnp.asarray(c_d, jnp.float32)
        self._w_cur = jnp.asarray(w_cur, jnp.float32)
        self._w_prev = jnp.asarray(w_prev, jnp.float32)

    def add_noise_at_start(self, x, noise):
        """Forward-noise x to the solve's starting level (level 0) —
        the DDIMSchedule.add_noise_at counterpart."""
        return self.alpha[0] * x + self.sigma[0] * noise

    def step(self, eps, i, x, x0_prev):
        """One solver transition at index i (jittable; i may be traced).

        Returns (x_next, x0) — carry x0 into the next step's x0_prev.
        For i == 0 the w_prev coefficient is 0, so the (zeros) x0_prev
        placeholder never contributes.
        """
        x0 = (x - self.sigma[i] * eps) / self.alpha[i]
        d = self._w_cur[i] * x0 + self._w_prev[i] * x0_prev
        return self._c_x[i] * x + self._c_d[i] * d, x0


class LMSSchedule:
    """LMSDiscrete with order-4 integrated-Lagrange coefficients.

    sigmas: (S,) descending; coeff[i, k] multiplies the k-th newest
    derivative at step i (zero-padded below order).
    """

    ORDER = 4

    def __init__(self, num_inference_steps=50, num_train_timesteps=1000,
                 beta_start=0.00085, beta_end=0.012, order=4):
        from scipy import integrate
        acp = _alphas_cumprod(num_train_timesteps, beta_start, beta_end)
        sig_train = np.sqrt((1.0 - acp) / acp)
        self.num_inference_steps = num_inference_steps
        t = np.linspace(num_train_timesteps - 1, 0, num_inference_steps)
        self.timesteps = t
        sigmas = np.interp(t, np.arange(num_train_timesteps), sig_train)
        sigmas = np.concatenate([sigmas, [0.0]])
        self.sigmas = jnp.asarray(sigmas, jnp.float32)
        self.order = order

        # coeff[i, k]: weight of derivative (i-k) when stepping i -> i+1
        coeffs = np.zeros((num_inference_steps, order))
        for i in range(num_inference_steps):
            o = min(i + 1, order)
            for k in range(o):
                def poly(tau, i=i, k=k, o=o):
                    prod = 1.0
                    for j in range(o):
                        if j == k:
                            continue
                        prod *= (tau - sigmas[i - j]) / (sigmas[i - k] - sigmas[i - j])
                    return prod
                coeffs[i, k] = integrate.quad(
                    poly, sigmas[i], sigmas[i + 1], epsrel=1e-8)[0]
        self.coeffs = jnp.asarray(coeffs, jnp.float32)

    def scale_input(self, x, i):
        """Latent input scaling 1/sqrt(sigma^2+1) (utils/sd_utils.py:113)."""
        s = self.sigmas[i]
        return x / jnp.sqrt(s * s + 1.0)

    def init_noise_scale(self):
        """Initial latents multiplier sigma[0] (utils/sd_utils.py:106)."""
        return self.sigmas[0]

    def derivative(self, eps, i, x):
        """d x / d sigma at step i: (x - x0)/sigma with x0 = x - sigma*eps."""
        s = self.sigmas[i]
        x0 = x - s * eps
        return (x - x0) / s

    def step(self, eps, i, x, deriv_hist):
        """One LMS step. deriv_hist: (ORDER, *x.shape), newest first.

        Returns (x_next, new_hist). Jittable with traced i.
        """
        d = self.derivative(eps, i, x)
        hist = jnp.concatenate([d[None], deriv_hist[:-1]], axis=0)
        w = self.coeffs[i]  # (ORDER,)
        x_next = x + jnp.tensordot(w, hist, axes=1)
        return x_next, hist

    def init_history(self, x):
        return jnp.zeros((self.order,) + x.shape, x.dtype)
