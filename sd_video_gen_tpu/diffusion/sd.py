"""SDPipeline: the reference SDUtils surface, rebuilt as jitted XLA programs.

Reference: utils/sd_utils.py — VAE encode/decode (128-169), CLIP text encode
with cond+uncond concat (78-95), full LMS denoising with CFG (97-126),
DDIM img2img partial denoising from start_step (222-267), img_to_img
(269-294), prompt_to_img (171-189), perturb_latents (216-220).

TPU-first: every loop is a lax.scan over precomputed scheduler constants
(diffusion/schedulers.py); the classifier-free-guidance pair runs as one
2B-batch UNet call; nothing touches the host between steps. Compiled
programs are cached per (num_steps, start_step, shape).

Weights: pass converted params (diffusion/weights.py) for real SD behavior;
absent weights fall back to random init (shape-correct, for tests/benches —
a loud warning is printed once).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from sd_video_gen_tpu.diffusion.schedulers import DDIMSchedule, LMSSchedule
from sd_video_gen_tpu.diffusion.vae_codec import VAECodec
from sd_video_gen_tpu.models.clip_text import (CLIPTextConfig, CLIPTextEncoder,
                                               empty_prompt_ids)
from sd_video_gen_tpu.models.unet import UNet2DCondition, UNetConfig
from sd_video_gen_tpu.models.vae import VAEConfig


class SDPipeline:
    def __init__(self, frame_size: int = 512, vae_params=None, unet_params=None,
                 clip_params=None, tokenizer_dir: str | None = None,
                 vae_cfg: VAEConfig | None = None,
                 unet_cfg: UNetConfig | None = None,
                 clip_cfg: CLIPTextConfig | None = None,
                 dtype=jnp.float32):
        self.frame_size = frame_size
        self.vae = VAECodec(frame_size, params=vae_params,
                            cfg=vae_cfg or VAEConfig(dtype=dtype))
        self.unet_cfg = unet_cfg or UNetConfig(dtype=dtype)
        self.unet = UNet2DCondition(self.unet_cfg)
        self.clip_cfg = clip_cfg or CLIPTextConfig(dtype=dtype)
        self.clip = CLIPTextEncoder(self.clip_cfg)
        self.tokenizer_dir = tokenizer_dir
        self._tokenizer = None

        if unet_params is None:
            warnings.warn("SDPipeline: no UNet weights provided — using "
                          "random init (outputs are not SD samples)")
            z = jnp.zeros((1, 8, 8, self.unet_cfg.in_channels))
            ctx = jnp.zeros((1, 2, self.unet_cfg.cross_attention_dim))
            # jit: single dispatch (eager init is minutes over the dev tunnel)
            unet_params = jax.jit(self.unet.init)(jax.random.PRNGKey(0), z,
                                                  jnp.zeros((1,), jnp.int32),
                                                  ctx)
        self.unet_params = unet_params
        if clip_params is None:
            clip_params = jax.jit(self.clip.init)(
                jax.random.PRNGKey(0),
                empty_prompt_ids(1, self.clip_cfg.max_length))
        self.clip_params = clip_params
        self._jit_cache: dict = {}

    @classmethod
    def from_pretrained_dir(cls, path: str, frame_size: int = 512,
                            dtype=jnp.float32) -> "SDPipeline":
        """Load a standard diffusers model directory layout:
        <path>/{vae,unet}/diffusion_pytorch_model.(safetensors|bin),
        <path>/text_encoder/(model.safetensors|pytorch_model.bin),
        <path>/tokenizer/. Missing components fall back to random init."""
        import os
        from sd_video_gen_tpu.diffusion import weights as W

        def find(sub, names):
            for n in names:
                p = os.path.join(path, sub, n)
                if os.path.exists(p):
                    return p
            return None

        def load(sub, names, conv):
            p = find(sub, names)
            return conv(W.load_state_dict(p)) if p else None

        model_files = ("diffusion_pytorch_model.safetensors",
                       "diffusion_pytorch_model.bin")
        tok = os.path.join(path, "tokenizer")
        return cls(
            frame_size=frame_size, dtype=dtype,
            vae_params=load("vae", model_files, W.convert_vae),
            unet_params=load("unet", model_files, W.convert_unet),
            clip_params=load("text_encoder",
                             ("model.safetensors", "pytorch_model.bin"),
                             W.convert_clip_text),
            tokenizer_dir=tok if os.path.isdir(tok) else None)

    # -- text ---------------------------------------------------------------
    def tokenize(self, prompts: list[str]) -> jnp.ndarray:
        """Token ids; '' needs no tokenizer data (the video --denoise path)."""
        if all(p == "" for p in prompts):
            return empty_prompt_ids(len(prompts), self.clip_cfg.max_length)
        if self._tokenizer is None:
            if self.tokenizer_dir is None:
                raise ValueError(
                    "non-empty prompts need a CLIP tokenizer: pass "
                    "tokenizer_dir with vocab.json/merges.txt")
            from transformers import CLIPTokenizer
            self._tokenizer = CLIPTokenizer.from_pretrained(self.tokenizer_dir)
        out = self._tokenizer(prompts, padding="max_length",
                              max_length=self.clip_cfg.max_length,
                              truncation=True, return_tensors="np")
        return jnp.asarray(out["input_ids"], jnp.int32)

    def _clip_apply(self):
        f = self._jit_cache.get("clip_apply")
        if f is None:
            f = jax.jit(self.clip.apply)
            self._jit_cache["clip_apply"] = f
        return f

    def encode_text(self, prompts: list[str]) -> jnp.ndarray:
        """[uncond; cond] embeddings, (2B, 77, hidden) — sd_utils:78-95."""
        cond = self._clip_apply()(self.clip_params, self.tokenize(prompts))
        uncond = self._clip_apply()(
            self.clip_params,
            empty_prompt_ids(len(prompts), self.clip_cfg.max_length))
        return jnp.concatenate([uncond, cond], axis=0)

    def uncond_embeddings(self, batch: int = 1) -> jnp.ndarray:
        """encode_text(['']) — the only text the video denoise path uses."""
        e = self._clip_apply()(
            self.clip_params, empty_prompt_ids(batch, self.clip_cfg.max_length))
        return jnp.concatenate([e, e], axis=0)

    # -- latent loops -------------------------------------------------------
    # NB: the jitted loop bodies take ``unet_params`` as an ARGUMENT — closing
    # over the multi-GB param tree would embed it as jaxpr constants, which
    # blows up lowering time/memory and defeats donation.
    def _unet_eps(self, unet_params, latents, t, text_embeddings,
                  guidance_scale):
        """CFG noise prediction: one 2B-batch UNet call (sd_utils:111-121).

        Static guidance_scale == 0 (a Python number, not a traced array)
        skips the pair: eps = eps_uncond + 0*(eps_text - eps_uncond) is
        bitwise eps_uncond, so the text half is pure waste — the reference
        burned 2x UNet FLOPs on it in the --denoise path
        (prediction/predict.py:148 gs=0). Callers that want live CFG pass a
        traced scale.
        """
        B = latents.shape[0]
        if isinstance(guidance_scale, (int, float)) and guidance_scale == 0.0:
            tt = jnp.broadcast_to(t, (B,))
            return self.unet.apply(unet_params, latents, tt,
                                   text_embeddings[:B])
        pair = jnp.concatenate([latents, latents], axis=0)
        tt = jnp.broadcast_to(t, (pair.shape[0],))
        eps = self.unet.apply(unet_params, pair, tt, text_embeddings)
        eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
        return eps_uncond + guidance_scale * (eps_text - eps_uncond)

    def denoise_img_latents(self, text_embeddings, height=512, width=512,
                            num_inference_steps=50, guidance_scale=7.5,
                            latents=None, rng=None, sampler="lms"):
        """Full denoise loop from noise (sd_utils:97-126). NHWC latents.

        ``sampler='lms'`` (default) is the reference-parity path.
        ``sampler='dpmpp'`` runs DPM-Solver++(2M) over the full training
        range in ``num_inference_steps`` UNet evals — the fast-generation
        extension (a 2nd-order solver typically matches 50-step LMS around
        15-20 steps; accuracy characterization in tests/test_dpmpp.py).
        Convention note: explicit ``latents`` are the VP sample x_T ~
        N(0, I) for dpmpp, while the LMS path scales them by sigma[0]
        internally (the sigma-space convention of sd_utils:106).
        """
        B = text_embeddings.shape[0] // 2
        if latents is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            latents = jax.random.normal(
                rng, (B, height // 8, width // 8, self.unet_cfg.in_channels))
        static_gs0 = (isinstance(guidance_scale, (int, float))
                      and guidance_scale == 0.0)
        if sampler == "dpmpp":
            from sd_video_gen_tpu.diffusion.schedulers import (
                DPMSolverPPSchedule)
            key = ("dpmpp_full", num_inference_steps, latents.shape,
                   static_gs0)
            if key not in self._jit_cache:
                # full range: t_start = the last training timestep (999),
                # matching LMS's linspace start; x_T is the pure-noise VP
                # sample so no input scaling applies
                dpm = DPMSolverPPSchedule(num_inference_steps, 999.0)
                timesteps = jnp.asarray(dpm.timesteps, jnp.float32)

                @jax.jit
                def run_dpm(unet_params, latents, text_embeddings,
                            guidance_scale):
                    def body(carry, i):
                        x, x0_prev = carry
                        eps = self._unet_eps(
                            unet_params, x, timesteps[i], text_embeddings,
                            0.0 if static_gs0 else guidance_scale)
                        x, x0 = dpm.step(eps, i, x, x0_prev)
                        return (x, x0), None

                    (x, _), _ = jax.lax.scan(
                        body, (latents, jnp.zeros_like(latents)),
                        jnp.arange(num_inference_steps))
                    return x

                self._jit_cache[key] = run_dpm
            return self._jit_cache[key](self.unet_params, latents,
                                        text_embeddings,
                                        jnp.float32(guidance_scale))
        if sampler != "lms":
            raise ValueError(f"unknown sampler '{sampler}' "
                             "(expected 'lms' or 'dpmpp')")
        key = ("lms", num_inference_steps, latents.shape, static_gs0)
        if key not in self._jit_cache:
            # LMSSchedule construction runs ~S*4 scipy quadratures — build
            # it only when compiling, not on every cached call
            sched = LMSSchedule(num_inference_steps)
            timesteps = jnp.asarray(sched.timesteps, jnp.float32)

            @jax.jit
            def run(unet_params, latents, text_embeddings, guidance_scale):
                x = latents * sched.init_noise_scale()
                hist = sched.init_history(x)

                def body(carry, i):
                    x, hist = carry
                    xin = sched.scale_input(x, i)
                    eps = self._unet_eps(unet_params, xin, timesteps[i],
                                         text_embeddings,
                                         0.0 if static_gs0 else guidance_scale)
                    x, hist = sched.step(eps, i, x, hist)
                    return (x, hist), None

                (x, _), _ = jax.lax.scan(body, (x, hist),
                                         jnp.arange(num_inference_steps))
                return x

            self._jit_cache[key] = run
        return self._jit_cache[key](self.unet_params, latents, text_embeddings,
                                    jnp.float32(guidance_scale))

    def i2i_scan(self, unet_params, latents, text_embeddings, guidance_scale,
                 start_step: int, num_inference_steps: int, noise_rng,
                 sampler: str = "ddim", solver_steps: int | None = None):
        """Pure partial-denoise body (traceable; params are arguments).

        Used by gen_i2i_latents and by the rollout refiner
        (diffusion/refine.py) so params never become jaxpr constants.

        ``sampler='ddim'`` (default) is the reference-parity path
        (utils/sd_utils.py:232-260). ``sampler='dpmpp'`` swaps the tail for
        DPM-Solver++(2M) over the SAME noise interval — ``start_step``
        still indexes the DDIM grid so the noising level is identical —
        with ``solver_steps`` UNet evaluations (default: half the DDIM
        tail, the measured equal-or-better accuracy point —
        tests/test_dpmpp.py).
        """
        sched = DDIMSchedule(num_inference_steps)
        if sampler == "dpmpp":
            from sd_video_gen_tpu.diffusion.schedulers import (
                DPMSolverPPSchedule)
            tail = sched.n_steps - start_step
            # explicit 0/1 must reach the schedule's num_steps >= 2 check,
            # not silently fall back to the default
            k = solver_steps if solver_steps is not None else max(2, tail // 2)
            dpm = DPMSolverPPSchedule(k, float(sched.timesteps[start_step]))
            timesteps = jnp.asarray(dpm.timesteps, jnp.float32)
            x = latents
            if start_step > 0:
                noise = jax.random.normal(noise_rng, x.shape, x.dtype)
                x = dpm.add_noise_at_start(x, noise)

            def dpm_body(carry, i):
                x, x0_prev = carry
                eps = self._unet_eps(unet_params, x, timesteps[i],
                                     text_embeddings, guidance_scale)
                x, x0 = dpm.step(eps, i, x, x0_prev)
                return (x, x0), None

            (x, _), _ = jax.lax.scan(dpm_body, (x, jnp.zeros_like(x)),
                                     jnp.arange(k))
            return x
        if sampler != "ddim":
            raise ValueError(f"unknown sampler '{sampler}' "
                             "(expected 'ddim' or 'dpmpp')")
        timesteps = jnp.asarray(sched.timesteps.copy(), jnp.float32)
        x = latents
        if start_step > 0:
            noise = jax.random.normal(noise_rng, x.shape, x.dtype)
            x = sched.add_noise_at(x, noise, start_step)

        def body(x, i):
            eps = self._unet_eps(unet_params, x, timesteps[i],
                                 text_embeddings, guidance_scale)
            return sched.step(eps, i, x), None

        # sched.n_steps, not num_inference_steps: diffusers iterates the
        # timesteps ARRAY, which is longer than S when S doesn't divide N
        x, _ = jax.lax.scan(body, x,
                            jnp.arange(start_step, sched.n_steps))
        return x

    def gen_i2i_latents(self, text_embeddings, height=512, width=512,
                        num_inference_steps=50, guidance_scale=7.5,
                        latents=None, start_step=10, rng=None,
                        return_all_latents=False):
        """DDIM partial denoise from start_step (sd_utils:222-267):
        add_noise at timesteps[start_step], then the remaining steps."""
        B = text_embeddings.shape[0] // 2
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if latents is None:
            # split: the add_noise draw below must be INDEPENDENT of the
            # initial latents (one key for both made noise == latents
            # bitwise, a correlated 'mixture' with std ~1.39)
            rng, lat_key = jax.random.split(rng)
            latents = jax.random.normal(
                lat_key,
                (B, height // 8, width // 8, self.unet_cfg.in_channels))
        sched = DDIMSchedule(num_inference_steps)
        static_gs0 = (isinstance(guidance_scale, (int, float))
                      and guidance_scale == 0.0)
        key = ("ddim", num_inference_steps, start_step, latents.shape,
               return_all_latents, static_gs0)
        if key not in self._jit_cache:
            timesteps = jnp.asarray(sched.timesteps.copy(), jnp.float32)

            @jax.jit
            def run(unet_params, latents, text_embeddings, guidance_scale,
                    noise_rng):
                x = latents
                if start_step > 0:
                    noise = jax.random.normal(noise_rng, x.shape, x.dtype)
                    x = sched.add_noise_at(x, noise, start_step)
                x0 = x

                def body(x, i):
                    eps = self._unet_eps(unet_params, x, timesteps[i],
                                         text_embeddings,
                                         0.0 if static_gs0 else guidance_scale)
                    x = sched.step(eps, i, x)
                    return x, x if return_all_latents else None

                x, hist = jax.lax.scan(
                    body, x, jnp.arange(start_step, sched.n_steps))
                if return_all_latents:
                    return jnp.concatenate([x0[None], hist], axis=0)
                return x

            self._jit_cache[key] = run
        noise_rng = rng
        out = self._jit_cache[key](self.unet_params, latents, text_embeddings,
                                   jnp.float32(guidance_scale), noise_rng)
        if return_all_latents:
            return out.reshape((-1,) + latents.shape[1:])
        return out

    # -- top-level generation (sd_utils:171-189, 269-294) -------------------
    def prompt_to_img(self, prompts, height=512, width=512,
                      num_inference_steps=50, guidance_scale=7.5,
                      latents=None, rng=None, sampler="lms"):
        if isinstance(prompts, str):
            prompts = [prompts]
        emb = self.encode_text(prompts)
        lat = self.denoise_img_latents(emb, height, width,
                                       num_inference_steps, guidance_scale,
                                       latents, rng, sampler=sampler)
        return self._decode_pixels(lat)

    def img_to_img(self, prompts, img, height=512, width=512,
                   num_inference_steps=50, guidance_scale=7.5,
                   start_step=10, rng=None):
        if isinstance(prompts, str):
            prompts = [prompts]
        lat = self.encode_img(img)
        emb = self.encode_text(prompts)
        out = self.gen_i2i_latents(emb, height, width, num_inference_steps,
                                   guidance_scale, latents=lat,
                                   start_step=start_step, rng=rng)
        return self._decode_pixels(out)

    # -- pixel <-> latent (NHWC spatial latents) ----------------------------
    def encode_img(self, imgs_u8):
        """(B, H, W, 3) uint8 -> (B, H/8, W/8, 4) scaled latents."""
        lat = self.vae.encode_frames(imgs_u8[:, None])  # (B,1,L)
        h = self.vae.latent_hw
        c = self.vae.cfg.latent_channels
        return lat.reshape(-1, c, h, h).transpose(0, 2, 3, 1)

    def _decode_pixels(self, latents_nhwc):
        """NHWC scaled latents of ANY spatial size -> uint8 pixels (the VAE is
        fully convolutional; don't round-trip through the codec's fixed
        frame_size flattening)."""
        from sd_video_gen_tpu.codecs import SD_LATENT_SCALE
        from sd_video_gen_tpu.models.vae import AutoencoderKL
        z = latents_nhwc / SD_LATENT_SCALE
        x = self.vae.model.apply(self.vae.params, z,
                                 method=AutoencoderKL.decode)
        x = jnp.clip(x.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
        return jnp.round(x * 255.0).astype(jnp.uint8)

    def perturb_latents(self, latents, scale=0.1, rng=None):
        """Latent jitter + renormalize (sd_utils:216-220)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        noise = jax.random.normal(rng, latents.shape, latents.dtype)
        new = (1 - scale) * latents + scale * noise
        return (new - new.mean()) / new.std()
