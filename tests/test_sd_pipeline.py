"""SDPipeline smoke + semantics at tiny model scale (no SD weights):
scan-based loops run, CFG math, partial-denoise step count, refine round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sd_video_gen_tpu.config import Config
from sd_video_gen_tpu.diffusion.sd import SDPipeline
from sd_video_gen_tpu.diffusion.refine import make_denoise_refiner
from sd_video_gen_tpu.models.vae import VAEConfig
from sd_video_gen_tpu.models.unet import UNetConfig
from sd_video_gen_tpu.models.clip_text import CLIPTextConfig


def _tiny_pipe(frame_size=32):
    return SDPipeline(
        frame_size=frame_size,
        vae_cfg=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                          norm_num_groups=2),
        unet_cfg=UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                            attention_heads=2, cross_attention_dim=16,
                            norm_num_groups=2),
        clip_cfg=CLIPTextConfig(vocab_size=49408, hidden_size=16, num_layers=1,
                                num_heads=2, intermediate_size=32,
                                max_length=8),
    )


@pytest.fixture(scope="module")
def pipe():
    with pytest.warns(UserWarning, match="random init"):
        return _tiny_pipe()


def test_uncond_embeddings_shape(pipe):
    emb = pipe.uncond_embeddings(2)
    assert emb.shape == (4, 8, 16)
    # uncond == cond half (same empty prompt)
    np.testing.assert_array_equal(np.asarray(emb[:2]), np.asarray(emb[2:]))


def test_tokenizer_gated(pipe):
    with pytest.raises(ValueError, match="tokenizer"):
        pipe.tokenize(["a photo of a cat"])
    ids = pipe.tokenize(["", ""])
    assert ids.shape == (2, 8)


def test_full_lms_denoise_runs(pipe):
    emb = pipe.uncond_embeddings(1)
    out = pipe.denoise_img_latents(emb, height=16, width=16,
                                   num_inference_steps=4, guidance_scale=7.5,
                                   rng=jax.random.PRNGKey(0))
    # 2-block VAE/UNet: /8 in the API maps to the train-time latent grid
    assert out.shape == (1, 2, 2, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_i2i_start_step_counts(pipe):
    """start_step=S means no denoising steps at all -> only add_noise."""
    emb = pipe.uncond_embeddings(1)
    lat = jnp.ones((1, 2, 2, 4))
    S = 4
    out_all = pipe.gen_i2i_latents(emb, num_inference_steps=S, start_step=0,
                                   latents=lat, guidance_scale=0.0,
                                   return_all_latents=True)
    # start_step=0: no noise added, S steps recorded + initial
    assert out_all.shape == (S + 1, 2, 2, 4)
    np.testing.assert_array_equal(np.asarray(out_all[0]), np.asarray(lat[0]))

    out_none = pipe.gen_i2i_latents(emb, num_inference_steps=S, start_step=S,
                                    latents=lat, guidance_scale=0.0,
                                    return_all_latents=True,
                                    rng=jax.random.PRNGKey(3))
    assert out_none.shape == (1, 2, 2, 4)  # only the noised initial latent


def test_cfg_zero_equals_uncond(pipe):
    """guidance_scale=0 must reduce to the uncond prediction path."""
    emb = pipe.uncond_embeddings(1)
    lat = jnp.ones((1, 2, 2, 4)) * 0.3
    a = pipe.gen_i2i_latents(emb, num_inference_steps=4, start_step=2,
                             latents=lat, guidance_scale=0.0,
                             rng=jax.random.PRNGKey(1))
    b = pipe.gen_i2i_latents(emb, num_inference_steps=4, start_step=2,
                             latents=lat, guidance_scale=1.0,
                             rng=jax.random.PRNGKey(1))
    # same (uncond==cond) embeddings: gs has no effect
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_perturb_latents_normalized(pipe):
    lat = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 4)),
                      jnp.float32)
    out = pipe.perturb_latents(lat, scale=0.3)
    assert abs(float(out.mean())) < 1e-5
    np.testing.assert_allclose(float(out.std()), 1.0, rtol=1e-4)


def test_denoise_refiner_round_trip():
    cfg = Config(config_name="t", frame_size=32)
    with pytest.warns(UserWarning, match="random init"):
        pipe = _tiny_pipe(frame_size=32)
    # 2-block tiny VAE: compression 2x -> latent_hw=16 at 32px
    refine_apply, refine_params = make_denoise_refiner(
        cfg, start_step=3, pipeline=pipe, num_inference_steps=4, hi_res=32)
    L = pipe.vae.latent_dim
    flat = jnp.asarray(np.random.default_rng(0).standard_normal((2, L)),
                       jnp.float32)
    out = refine_apply(refine_params, flat)
    assert out.shape == (2, L)
    assert np.isfinite(np.asarray(out)).all()
    # params thread through an outer jit as arguments (rollout requirement).
    # eager vs jit differ by f32 fusion rounding through the 4-step DDIM
    # round trip — this asserts the same computation runs, not bit equality.
    out2 = jax.jit(refine_apply)(refine_params, flat)
    assert np.isfinite(np.asarray(out2)).all()
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-3)


def test_prompt_to_img_and_img_to_img(pipe, rng):
    """Top-level generation surfaces (sd_utils:171-189, 269-294) at tiny scale."""
    imgs = pipe.prompt_to_img("", height=16, width=16, num_inference_steps=2,
                              guidance_scale=7.5, rng=jax.random.PRNGKey(0))
    # tiny 2-block VAE: /8 latent grid in the API, decoded at 2x upsampling
    assert imgs.dtype == np.uint8 and imgs.ndim == 4 and imgs.shape[0] == 1
    assert np.isfinite(imgs.astype(np.float32)).all()

    src = rng.integers(0, 255, (1, 32, 32, 3)).astype(np.uint8)
    out = pipe.img_to_img("", img=jnp.asarray(src), height=32, width=32,
                          num_inference_steps=4, guidance_scale=0.0,
                          start_step=2, rng=jax.random.PRNGKey(1))
    assert out.dtype == np.uint8 and out.shape[0] == 1


def test_static_gs0_skips_cfg_pair_bitwise(pipe):
    """guidance_scale=0.0 (static) runs the UNet on B instead of 2B and must
    compute the same function as the pair path (eps_u + 0*(eps_t-eps_u)).
    Tolerance is one-ULP-scale, not bitwise: XLA picks different gemm
    tilings for the B and 2B batch shapes (observed when the GEGLU became
    two denses), which legally reassociates the f32 reductions."""
    rng = np.random.default_rng(5)
    lat = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    emb = pipe.uncond_embeddings(2)
    key = jax.random.PRNGKey(3)
    fast = pipe.i2i_scan(pipe.unet_params, lat, emb, guidance_scale=0.0,
                         start_step=8, num_inference_steps=10, noise_rng=key)
    pair = pipe.i2i_scan(pipe.unet_params, lat, emb,
                         guidance_scale=jnp.float32(0.0),
                         start_step=8, num_inference_steps=10, noise_rng=key)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(pair),
                               rtol=3e-5, atol=3e-6)


def test_rollout_with_refine_hook_composition(pipe, rng):
    """The north-star composition (bench vae_denoise): encode -> ar_rollout
    with the per-frame partial-denoise hook -> decode, as ONE jitted fn.
    Checks the hook actually fires per frame (refined != unrefined), the
    step index threads (per-frame noise keys -> frames refined differently
    than a fixed key would), and the cached rollout accepts the same hook."""
    from sd_video_gen_tpu.diffusion.vae_codec import VAECodec
    from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
    from sd_video_gen_tpu.ops.rollout import ar_rollout
    from sd_video_gen_tpu.ops.cached_rollout import cached_rollout

    cfg = Config(config_name="t", frame_size=32)
    refine_apply, rp = make_denoise_refiner(cfg, start_step=2, pipeline=pipe,
                                            num_inference_steps=3, hi_res=32)
    codec = VAECodec(32, params=pipe.vae.params, cfg=pipe.vae.cfg)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=32,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0)
    model = FrameTransformer(mc)
    frames = jnp.asarray(rng.integers(0, 255, (1, 3, 32, 32, 3)), jnp.uint8)

    @jax.jit
    def run(params, rp, frames):
        lat = codec.encode_batch(frames, use_sos=True, params=rp["vae"])
        refined = ar_rollout(
            model.apply, params, lat, 2, window=3,
            refine_fn=lambda z, i: refine_apply(rp, z, i))
        plain = ar_rollout(model.apply, params, lat, 2, window=3)
        return refined, plain

    lat0 = codec.encode_batch(frames, use_sos=True)
    params = model.init(jax.random.PRNGKey(0), lat0, lat0[:, :-1])
    refined, plain = run(params, rp, frames)
    assert refined.shape == plain.shape == (1, 2, codec.latent_dim)
    assert np.isfinite(np.asarray(refined)).all()
    # the hook fired (UNet steps changed every frame)
    for t in range(2):
        assert np.abs(np.asarray(refined[:, t] - plain[:, t])).max() > 1e-4

    cached = cached_rollout(mc, params,
                            codec.encode_batch(frames, use_sos=True),
                            2, refine_fn=lambda z, i: refine_apply(rp, z, i))
    # frame 1 contract holds WITH the refine hook attached
    np.testing.assert_allclose(np.asarray(cached[:, 0]),
                               np.asarray(refined[:, 0]), rtol=2e-4, atol=2e-4)


def test_gen_i2i_noise_independent_of_init_latents(pipe):
    """Regression: latents=None reused ONE key for the init-latents draw and
    the add_noise draw, making 'noise' bitwise equal to the latents (a
    correlated scalar mixture, std ~1.39 instead of 1)."""
    from sd_video_gen_tpu.diffusion.schedulers import DDIMSchedule

    k = jax.random.PRNGKey(7)
    out = pipe.gen_i2i_latents(pipe.uncond_embeddings(1), height=16, width=16,
                               num_inference_steps=4, guidance_scale=0.0,
                               start_step=2, rng=k, return_all_latents=True)
    x0 = np.asarray(out[0])  # post-add_noise starting sample
    k_noise, k_lat = jax.random.split(k)
    lat = np.asarray(jax.random.normal(
        k_lat, (1, 2, 2, pipe.unet_cfg.in_channels)))
    noise = np.asarray(jax.random.normal(k_noise, lat.shape, lat.dtype))
    a = float(DDIMSchedule(4).alpha[2])
    np.testing.assert_allclose(
        x0, (np.sqrt(a) * lat + np.sqrt(1 - a) * noise)[0],
        rtol=1e-5, atol=1e-6)
    assert abs(float(np.std(x0)) - 1.0) < 0.35  # not the 1.39-std mixture


def test_i2i_scan_nondivisor_steps(pipe, rng):
    """S=7 (non-divisor): the scan must run to t=0 (8 entries) and stay
    finite — range(S) loops dropped the final step."""
    lat = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    out = pipe.i2i_scan(pipe.unet_params, lat, pipe.uncond_embeddings(1),
                        guidance_scale=0.0, start_step=3,
                        num_inference_steps=7,
                        noise_rng=jax.random.PRNGKey(0))
    assert out.shape == lat.shape and np.isfinite(np.asarray(out)).all()


def test_full_dpmpp_denoise_runs(pipe):
    """sampler='dpmpp' on the full generation path: DPM-Solver++(2M) over
    the whole training range from a pure-noise VP sample (the fast-
    generation extension; accuracy evidence in tests/test_dpmpp.py)."""
    emb = pipe.uncond_embeddings(1)
    out = pipe.denoise_img_latents(emb, height=16, width=16,
                                   num_inference_steps=4,
                                   guidance_scale=7.5,
                                   rng=jax.random.PRNGKey(0),
                                   sampler="dpmpp")
    assert out.shape == (1, 2, 2, 4)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic given the rng
    out2 = pipe.denoise_img_latents(emb, height=16, width=16,
                                    num_inference_steps=4,
                                    guidance_scale=7.5,
                                    rng=jax.random.PRNGKey(0),
                                    sampler="dpmpp")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    with pytest.raises(ValueError, match="unknown sampler"):
        pipe.denoise_img_latents(emb, height=16, width=16,
                                 num_inference_steps=4, sampler="euler")


def test_dpmpp_tail_accuracy_on_unet_graph(pipe, rng):
    """Video-level gate groundwork (VERDICT r4 #3): on the ACTUAL UNet
    compute graph (not the analytic problems), the dpmpp-5 tail must land
    at least as close to the fine-step ODE limit as the DDIM-10 tail it
    replaces, and the drift between the two shipped tails must stay
    bounded. Truth = dpmpp-64 over the SAME lambda interval with the same
    handoff noise (an earlier mis-matched-grid 'truth' made dpmpp read 2x
    WORSE than ddim — the grids' t_start differ across step counts, so the
    reference must share the handoff exactly)."""
    lat = jnp.asarray(rng.standard_normal((2, 4, 4, 4)) * 0.2, jnp.float32)
    emb = pipe.uncond_embeddings(1)

    def run(sampler, k=None):
        return np.asarray(pipe.i2i_scan(
            pipe.unet_params, lat, emb, guidance_scale=0.0, start_step=40,
            num_inference_steps=50, noise_rng=jax.random.PRNGKey(0),
            sampler=sampler, solver_steps=k), np.float64)

    l2 = lambda a: np.sqrt((a ** 2).sum())
    truth = run("dpmpp", 64)
    ddim10, dpmpp5 = run("ddim"), run("dpmpp", 5)
    err5 = l2(dpmpp5 - truth) / l2(truth)
    err10 = l2(ddim10 - truth) / l2(truth)
    # measured on this fixture: 0.039 vs 0.101 (2.6x) — assert the ordering
    # with margin, not the exact values
    assert err5 < err10, (err5, err10)
    # and the absolute drift between the two shipped tails stays bounded
    # (measured 0.113; dominated by DDIM-10's own truncation error)
    assert l2(dpmpp5 - ddim10) / l2(ddim10) < 0.25


def test_dpmpp_final_sigma_zero_endpoint():
    """final_sigma_zero=True (default): the last transition emits the exact
    x0 prediction — matching DDIMSchedule's set_alpha_to_one endpoint —
    while the legacy mode retains the trained schedule's sigma(0)~0.029."""
    from sd_video_gen_tpu.diffusion.schedulers import DPMSolverPPSchedule
    new = DPMSolverPPSchedule(4, 180.0)
    old = DPMSolverPPSchedule(4, 180.0, final_sigma_zero=False)
    assert float(new.sigma[-1]) == 0.0 and float(new.alpha[-1]) == 1.0
    assert float(old.sigma[-1]) > 0.02
    # eps-model eval levels are identical — same UNet cost either way
    np.testing.assert_allclose(new.timesteps, old.timesteps)
    np.testing.assert_allclose(np.asarray(new.sigma[:-1]),
                               np.asarray(old.sigma[:-1]))
    # final transition: x_next = x0 exactly, regardless of x
    x = np.asarray([2.0, -1.0], np.float32)
    eps = np.asarray([0.3, 0.1], np.float32)
    x0 = (x - float(new.sigma[3]) * eps) / float(new.alpha[3])
    nxt, _ = new.step(jnp.asarray(eps), 3, jnp.asarray(x),
                      jnp.zeros_like(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(nxt), x0, rtol=1e-6)
