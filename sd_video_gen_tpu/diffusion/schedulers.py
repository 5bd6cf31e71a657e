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
