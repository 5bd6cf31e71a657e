"""Generate committed golden fixtures (tests/fixtures/*.npz).

VERDICT r1 item 5: parity must be regression-locked, not re-derived by the
same author each test run. This tool records, ONCE:

  scheduler_constants.npz — DDIM/LMS timesteps, alphas, sigmas and LMS
    coefficients computed by an INDEPENDENT re-implementation of the
    diffusers-0.2.3 formulas below (structured after the reference pin's
    scheduling_{ddim,lms_discrete}.py, not after our schedulers.py), for
    num_inference_steps in {10, 50}.

  vae_golden.npz / unet_golden.npz — the torch-replica state dicts (full
    SD topology at reduced width), a fixed input, and the torch forward
    output, taken from the replicas in tests/test_vae.py / test_unet.py.
  i3d_golden.npz — torch Conv3d TF-SAME-padded forward for the Unit3D
    padding contract (tests/test_fvd.py oracle).

Tests (tests/test_golden_fixtures.py) then load these and compare the JAX
models via the real conversion path — torch never runs at test time, and a
change in either the models, the converters, or the schedulers trips the
fixture.

Run: python tools/make_golden_fixtures.py   (regenerates in place)
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, os.path.join(HERE, "..", "tests"))
FIXDIR = os.path.join(HERE, "..", "tests", "fixtures")


# ---------------------------------------------------------------------------
# Independent diffusers-0.2.3 scheduler formulas (NOT importing our package).
# ---------------------------------------------------------------------------

def _betas_scaled_linear(n=1000, beta_start=0.00085, beta_end=0.012):
    return np.linspace(beta_start ** 0.5, beta_end ** 0.5, n,
                       dtype=np.float64) ** 2


def ddim_constants(num_inference_steps, n_train=1000):
    """diffusers 0.2.3 DDIMScheduler: set_timesteps uses
    arange(0, n_train, n_train//S) reversed; step uses alphas_cumprod[t] and
    alphas_cumprod[t - n_train//S] (final_alpha=1 with set_alpha_to_one)."""
    acp = np.cumprod(1.0 - _betas_scaled_linear(n_train))
    step = n_train // num_inference_steps
    timesteps = np.arange(0, n_train, step)[::-1].copy()
    alpha = acp[timesteps]
    prev_t = timesteps - step
    alpha_prev = np.where(prev_t >= 0, acp[np.clip(prev_t, 0, None)], 1.0)
    return {"timesteps": timesteps.astype(np.int64),
            "alpha": alpha.astype(np.float64),
            "alpha_prev": alpha_prev.astype(np.float64)}


def lms_constants(num_inference_steps, n_train=1000, order=4):
    """diffusers 0.2.3 LMSDiscreteScheduler: sigmas interpolated over
    linspace(n-1, 0, S); get_lms_coefficient integrates the Lagrange basis
    over [sigma_t, sigma_t+1] (scipy.integrate.quad)."""
    from scipy import integrate
    acp = np.cumprod(1.0 - _betas_scaled_linear(n_train))
    sig_train = ((1.0 - acp) / acp) ** 0.5
    timesteps = np.linspace(n_train - 1, 0, num_inference_steps)
    sigmas = np.interp(timesteps, np.arange(n_train), sig_train)
    sigmas = np.concatenate([sigmas, [0.0]])

    def lms_coeff(o, t, current_order):
        def fn(tau):
            prod = 1.0
            for k in range(o):
                if current_order == k:
                    continue
                prod *= (tau - sigmas[t - k]) / (
                    sigmas[t - current_order] - sigmas[t - k])
            return prod
        return integrate.quad(fn, sigmas[t], sigmas[t + 1], epsrel=1e-8)[0]

    coeffs = np.zeros((num_inference_steps, order))
    for t in range(num_inference_steps):
        o = min(t + 1, order)
        for k in range(o):
            coeffs[t, k] = lms_coeff(o, t, k)
    return {"timesteps": timesteps.astype(np.float64),
            "sigmas": sigmas.astype(np.float64),
            "coeffs": coeffs.astype(np.float64)}


def write_scheduler_fixture():
    out = {}
    for s in (10, 50):
        for k, v in ddim_constants(s).items():
            out[f"ddim{s}/{k}"] = v
        for k, v in lms_constants(s).items():
            out[f"lms{s}/{k}"] = v
    np.savez_compressed(os.path.join(FIXDIR, "scheduler_constants.npz"), **out)
    print("scheduler_constants.npz:", len(out), "arrays")


# ---------------------------------------------------------------------------
# Torch-replica activation goldens (full SD topology at reduced width).
# ---------------------------------------------------------------------------

def write_vae_fixture():
    import torch
    import test_vae as tv
    rng = np.random.default_rng(42)
    tvae, _, _ = tv._models(blocks=(4, 8, 16, 16), layers=2)
    sd = {k: v.detach().numpy() for k, v in tvae.state_dict().items()}
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    z = rng.standard_normal((1, tv.LATENT, 4, 4)).astype(np.float32)
    with torch.no_grad():
        mean = tvae.quant_conv(tvae.encoder(torch.tensor(x)))[:, :tv.LATENT]
        dec = tvae.decoder(tvae.post_quant_conv(torch.tensor(z)))
    out = {f"sd/{k}": v for k, v in sd.items()}
    out.update({"in/x": x, "in/z": z,
                "out/enc_mean": mean.numpy(), "out/dec": dec.numpy(),
                "meta/blocks": np.array((4, 8, 16, 16)),
                "meta/layers": np.array(2),
                "meta/groups": np.array(tv.GROUPS),
                "meta/latent": np.array(tv.LATENT)})
    np.savez_compressed(os.path.join(FIXDIR, "vae_golden.npz"), **out)
    print("vae_golden.npz:", len(out), "arrays")


def write_unet_fixture():
    import torch
    import test_unet as tu
    rng = np.random.default_rng(43)
    blocks, layers, spatial = (8, 16, 32, 32), 2, 16
    torch.manual_seed(0)
    tu.TEMB = blocks[0] * 4
    tun = tu.TUNet(blocks, layers).eval()
    sd = {k: v.numpy() for k, v in tun.state_dict().items()}
    x = rng.standard_normal((2, 4, spatial, spatial)).astype(np.float32)
    t = np.array([10, 500], np.int64)
    ctx = rng.standard_normal((2, 5, tu.CTX)).astype(np.float32)
    with torch.no_grad():
        ref = tun(torch.tensor(x), torch.tensor(t), torch.tensor(ctx)).numpy()
    out = {f"sd/{k}": v for k, v in sd.items()}
    out.update({"in/x": x, "in/t": t, "in/ctx": ctx, "out/eps": ref,
                "meta/blocks": np.array(blocks), "meta/layers": np.array(layers),
                "meta/heads": np.array(tu.HEADS), "meta/ctx_dim": np.array(tu.CTX),
                "meta/groups": np.array(tu.GROUPS)})
    np.savez_compressed(os.path.join(FIXDIR, "unet_golden.npz"), **out)
    print("unet_golden.npz:", len(out), "arrays")


def write_i3d_fixture():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(44)
    x = rng.standard_normal((1, 5, 9, 9, 2)).astype(np.float32)  # NDHWC
    tconv = torch.nn.Conv3d(2, 4, (3, 3, 3), stride=(2, 2, 2), padding=0,
                            bias=True)
    torch.manual_seed(0)
    torch.nn.init.normal_(tconv.weight)
    torch.nn.init.normal_(tconv.bias)
    tx = torch.tensor(x.transpose(0, 4, 1, 2, 3))
    # TF-SAME dynamic padding as pytorch_i3d.py:80-105 hand-rolls
    pads = []
    for dim, k, s in zip(tx.shape[2:], (3, 3, 3), (2, 2, 2)):
        out = -(-dim // s)
        total = max((out - 1) * s + k - dim, 0)
        pads = [total // 2, total - total // 2] + pads
    with torch.no_grad():
        ref = tconv(F.pad(tx, pads)).numpy()
    out = {"in/x": x,
           "sd/weight": tconv.weight.detach().numpy(),
           "sd/bias": tconv.bias.detach().numpy(),
           "out/y": ref}
    np.savez_compressed(os.path.join(FIXDIR, "i3d_golden.npz"), **out)
    print("i3d_golden.npz:", len(out), "arrays")


if __name__ == "__main__":
    os.makedirs(FIXDIR, exist_ok=True)
    write_scheduler_fixture()
    write_vae_fixture()
    write_unet_fixture()
    write_i3d_fixture()
