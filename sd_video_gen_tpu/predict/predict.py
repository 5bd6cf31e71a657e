"""AR prediction CLI: reference-compatible flags, one jitted rollout program.

Reference: prediction/predict.py — per-clip Python loop re-running the full
model per frame with >=6 host round-trips when denoising. Here: encode ->
lax.scan rollout (ops/rollout.py) -> decode is one XLA program per clip; only
uint8 frames cross the host boundary. Variants are flags, not scripts:
  --train_mode diff   : residual rollout (prediction/predict_diff.py:33 —
                        each predicted latent += previous frame's latent)
  --train_mode future : single-shot k-frame (prediction/predict_future.py:156)
  --naive             : Identity copy-last-frame baseline
                        (prediction/predict_naive_and_mnist.py)
  --denoise           : per-step partial-denoise refinement
                        (prediction/predict.py:145-186), needs SD weights.

Output: outputs/<n>/<i>.png with a red border on predicted frames
(prediction/predict.py:201-229); --show displays interactively when a GUI is
available.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.codecs import make_codec
from sd_video_gen_tpu.config import build_arg_parser, load_config
from sd_video_gen_tpu.models import (FrameTransformer, FrameTransformerConfig,
                                     IdentityModel)
from sd_video_gen_tpu.ops.rollout import ar_rollout
from sd_video_gen_tpu.ops.masks import causal_mask
from sd_video_gen_tpu.train import checkpoint as ckpt
from sd_video_gen_tpu.train.trainer import build_dataset, TrainState
import optax


def load_model_params(cfg, args, model, codec, mode_flag: str):
    """Restore params from <checkpoint_dir>/<config>_<index>_<mode>
    (prediction/predict.py:51 naming)."""
    path = ckpt.checkpoint_path(args.checkpoint_dir, args.config, args.index,
                                mode_flag or args.mode or "test")
    # Reference-trained torch checkpoints: --torch_checkpoint, or a .pt file
    # with the reference's exact naming sitting in the checkpoint dir
    # (prediction/predict.py:51 loads './checkpoints/<cfg>_<idx>_<mode>.pt').
    torch_path = getattr(args, "torch_checkpoint", None)
    if torch_path is None and os.path.isfile(path + ".pt"):
        torch_path = path + ".pt"
    if torch_path is not None:
        from sd_video_gen_tpu.diffusion.weights import (load_state_dict,
                                                        convert_exhaustive,
                                                        assert_matches_model)
        mcfg = getattr(model, "cfg", None)
        mode = getattr(mcfg, "mode", "ar")
        params = convert_exhaustive("transformer", load_state_dict(torch_path),
                                    mode=mode)
        # Validate the converted tree against THIS model's structure: if the
        # --config disagrees with the .pt (e.g. fewer layers), flax apply
        # would silently ignore the extra converted layers and serve a
        # partially-loaded model. eval_shape costs no FLOPs.
        if mcfg is not None:
            dummy = jnp.zeros((1, 4, mcfg.latent_dim), jnp.float32)
            text_dummy = (jnp.zeros((1, mcfg.text_embed_dim), jnp.float32)
                          if mcfg.mode == "text" else None)
            abstract = jax.eval_shape(
                lambda s: model.init(jax.random.PRNGKey(0), s, s[:, :-1],
                                     tgt_mask=causal_mask(3),
                                     text_embeds=text_dummy), dummy)
            assert_matches_model(params, abstract)
        return params
    # Build the abstract TrainState matching what the trainer saved —
    # everything under eval_shape so no real VAE encode runs at CLI startup.
    sample = jnp.zeros((1, cfg.frames_per_clip, cfg.frame_size,
                        cfg.frame_size, 3), jnp.uint8)

    text_dummy = None
    if getattr(getattr(model, "cfg", None), "mode", None) == "text":
        text_dummy = jnp.zeros((1, model.cfg.text_embed_dim), jnp.float32)

    def _init(s):
        latents = codec.encode_batch(s, use_sos=True)
        return model.init(jax.random.PRNGKey(0), latents, latents[:, :-1],
                          tgt_mask=causal_mask(latents.shape[1] - 1),
                          text_embeds=text_dummy)

    variables = jax.eval_shape(_init, sample)
    abstract = jax.eval_shape(
        lambda v: TrainState.create(apply_fn=model.apply, params=v,
                                    tx=optax.adam(cfg.lr)), variables)
    # orbax needs concrete shardings on the abstract leaves
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    abstract = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding),
        abstract)
    state = ckpt.restore_checkpoint(path, abstract)
    return state.params


def save_frames(imgs: np.ndarray, is_pred: list[bool], out_root: str = "outputs"):
    os.makedirs(out_root, exist_ok=True)
    # first FREE integer name: len(listdir) collides after deletions or
    # stray files and silently overwrites a previous run's frames
    n = len(os.listdir(out_root))
    while os.path.exists(os.path.join(out_root, str(n))):
        n += 1
    folder = os.path.join(out_root, str(n))
    os.makedirs(folder)
    for i, img in enumerate(imgs):
        if is_pred[i]:
            img = cv2.copyMakeBorder(img, 1, 1, 1, 1, cv2.BORDER_CONSTANT,
                                     value=[0, 0, 255])
        cv2.imwrite(os.path.join(folder, f"{i}.png"), img)
    return folder


def show_frames(imgs: np.ndarray, is_pred: list[bool], fullscreen: bool):
    for i, img in enumerate(imgs):
        if is_pred[i]:
            img = cv2.copyMakeBorder(img, 1, 1, 1, 1, cv2.BORDER_CONSTANT,
                                     value=[0, 0, 255])
        if fullscreen:
            cv2.namedWindow("frame", cv2.WND_PROP_FULLSCREEN)
            cv2.setWindowProperty("frame", cv2.WND_PROP_FULLSCREEN,
                                  cv2.WINDOW_FULLSCREEN)
        cv2.imshow("frame", img)
        cv2.waitKey(0)


def make_predict_fn(model, codec, pred_frames: int, window: int,
                    mode: str = "ar", refiner=None, rollout: str = "full",
                    int8: bool = False, future_horizon: int | None = None):
    """One jitted program: frames -> (context latents, predicted latents).

    ``mode='text'`` takes text embeddings as a third argument
    (prediction/predict_text.py rollout semantics, minus its host-side
    SentenceTransformer sync). ``refiner`` is the (apply, params) pair from
    diffusion/refine.make_denoise_refiner — its params enter the jit as an
    argument, never as jaxpr constants.

    ``rollout='cached'`` (mode='ar' only) switches to the KV-cached
    frozen-memory serving path (ops/cached_rollout.py): frame 1 identical
    to the full re-forward, later frames condition the frozen context
    memory instead of re-encoding predictions — see PARITY.md.
    """
    if rollout == "cached" and mode != "ar":
        raise ValueError("--rollout cached supports --train_mode ar only")
    if mode in ("future", "learned_tgt") and future_horizon is not None \
            and pred_frames > future_horizon:
        raise ValueError(
            f"pred_frames {pred_frames} exceeds the model's trained future "
            f"horizon {future_horizon} (frames_to_predict)")
    if int8 and mode not in ("ar", "diff"):
        raise ValueError("--int8 supports --train_mode ar/diff only")

    apply_fn = model.apply
    if int8 and rollout != "cached":
        # full re-forward with int8 matmuls (ops/quantized.quantized_ar_apply;
        # the cached path handles int8 transparently via its param tree)
        from sd_video_gen_tpu.ops.quantized import quantized_ar_apply
        H = model.cfg.num_heads

        pe = getattr(model.cfg, "pe_mode", "timestep")

        def apply_fn(params, src, tgt, tgt_mask=None, **kw):
            return quantized_ar_apply(params, src, tgt, tgt_mask=tgt_mask,
                                      num_heads=H, pe_mode=pe)
    if mode == "diff":
        base_apply = apply_fn

        def apply_fn(params, src, tgt, tgt_mask=None, **kw):
            out = base_apply(params, src, tgt, tgt_mask=tgt_mask, **kw)
            # residual: predicted next latent = model output + last input frame
            # (prediction/predict_diff.py:33)
            return out.at[:, -1].add(tgt[:, -1])

    refine_apply, refine_params = refiner if refiner is not None else (None, None)
    codec_params = getattr(codec, "params", None)  # thread VAE weights as args

    @jax.jit
    def predict_impl(params, rparams, cparams, frames_u8, text_embeds=None):
        if cparams is not None:
            latents = codec.encode_batch(frames_u8, use_sos=True,
                                         params=cparams)
        else:
            latents = codec.encode_batch(frames_u8, use_sos=True)
        kwargs = {"text_embeds": text_embeds} if text_embeds is not None else {}
        refine_fn = (None if refine_apply is None
                     else lambda x, i: refine_apply(rparams, x, i))
        if mode in ("future", "learned_tgt"):
            # single shot: the model's last `frames_to_predict` outputs are
            # future frames 1..k, so evaluating fewer than k must take the
            # FIRST pred_frames of that span — slicing [-pred_frames:]
            # would score frames (k-p+1..k) against GT frames (1..p), a
            # silent temporal shift. learned_tgt ignores tgt and decodes
            # its learned queries the same single-shot way.
            y_in = latents[:, 1:]  # drop SOS; single shot
            out = model.apply(params, y_in, y_in, tgt_mask=None, **kwargs)
            k = future_horizon or pred_frames
            preds = out[:, -k:][:, :pred_frames]
            if refine_fn is not None:
                # --denoise refines each predicted latent (the AR branches
                # do this inside their rollouts; skipping it here silently
                # ignored the flag for single-shot modes)
                preds = jnp.stack(
                    [refine_fn(preds[:, i], i)
                     for i in range(preds.shape[1])], axis=1)
        elif rollout == "cached":
            from sd_video_gen_tpu.ops.cached_rollout import cached_rollout
            preds = cached_rollout(model.cfg, params, latents, pred_frames,
                                   refine_fn=refine_fn)
        else:
            preds = ar_rollout(apply_fn, params, latents, pred_frames,
                               window=window, refine_fn=refine_fn,
                               model_kwargs=kwargs)
        return latents[:, 1:], preds

    def predict(params, frames_u8, text_embeds=None):
        return predict_impl(params, refine_params, codec_params, frames_u8,
                            text_embeds)

    return predict


def main(argv=None):
    from sd_video_gen_tpu.utils.backend import honor_platform_pin
    from sd_video_gen_tpu.utils.cache import enable_compilation_cache
    honor_platform_pin()
    enable_compilation_cache()
    parser = build_arg_parser()
    parser.add_argument("--train_mode", type=str, default="ar",
                        choices=["ar", "future", "diff", "text",
                                 "learned_tgt"])
    parser.add_argument("--codec", type=str, default="pixel",
                        choices=["pixel", "vae"])
    parser.add_argument("--naive", type=lambda s: s.lower() == "true",
                        default=False, help="Identity copy-last-frame baseline")
    parser.add_argument("--max_clips", type=int, default=4)
    parser.add_argument("--batch_clips", type=int, default=1,
                        help="clips rolled out per jitted call (serving batch)")
    parser.add_argument("--rollout", type=str, default="full",
                        choices=["full", "cached"],
                        help="cached: KV-cached frozen-memory serving path "
                             "(ar mode; see PARITY.md for semantics)")
    parser.add_argument("--int8", type=lambda s: s.lower() == "true",
                        default=False,
                        help="int8-quantize the transformer weights for "
                             "serving (full or cached rollout; ar/diff modes; "
                             "bench: 91.3K vs 80.7K frames/s cached)")
    parser.add_argument("--reference_pe", action="store_true",
                        help="serve with the reference's (buggy) per-batch-"
                             "index positional encoding so converted "
                             "reference checkpoints reproduce their trained "
                             "forward exactly (PARITY.md 'Known deviations')")
    parser.add_argument("--text_table", type=str, default=None,
                        help="npy table from tools/export_text_embeddings.py "
                             "(exact MiniLM class embeddings) for text mode; "
                             "default is the hash-seeded fallback table")
    parser.add_argument("--denoise_sampler", type=str, default="ddim",
                        choices=["ddim", "dpmpp"],
                        help="ddim = reference-parity tail; dpmpp = "
                             "DPM-Solver++(2M) over the same noise interval "
                             "in ~half the UNet evals (2nd-order; analytic "
                             "accuracy evidence in tests/test_dpmpp.py)")
    parser.add_argument("--denoise_solver_steps", type=int, default=None,
                        help="dpmpp UNet evaluations (default: half the "
                             "DDIM tail, min 2)")
    parser.add_argument("--timing", action="store_true",
                        help="print a per-stage wall-clock JSON line at exit "
                             "(predict incl. compile on first batch / "
                             "decode / host io)")
    parser.add_argument("--serve", type=str, default=None, metavar="SOCK",
                        help="persistent serving mode: instead of iterating "
                             "a dataset, warm-compile the serving program "
                             "once, print SERVE_READY, and answer clip "
                             "batches over this Unix socket until shutdown "
                             "(predict/serve.py — amortizes the measured "
                             "200-270s per-process cold start)")
    args = parser.parse_args(argv)
    if args.reference_pe and (args.int8 or args.rollout == "cached"):
        parser.error("--reference_pe is the full-forward compat path "
                     "(incompatible with --int8 / --rollout cached)")
    if args.rollout == "cached" and args.naive:
        parser.error("--rollout cached needs the transformer model "
                     "(incompatible with --naive)")
    if args.int8 and args.train_mode not in ("ar", "diff"):
        parser.error("--int8 supports --train_mode ar/diff only")
    if args.int8 and args.naive:
        parser.error("--int8 quantizes the transformer "
                     "(incompatible with --naive)")
    cfg = load_config(args.config, args.config_dir)

    vae_params = None
    if args.codec == "vae" and args.vae_weights:
        from sd_video_gen_tpu.diffusion.weights import (load_state_dict,
                                                        convert_vae)
        vae_params = convert_vae(load_state_dict(args.vae_weights))
    codec = make_codec(cfg, args.codec, vae_params=vae_params)
    if args.naive:
        model = IdentityModel()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, codec.latent_dim)),
                            jnp.zeros((1, 2, codec.latent_dim)))
    else:
        model = FrameTransformer(FrameTransformerConfig.from_config(
            cfg, mode="ar" if args.train_mode == "diff" else args.train_mode,
            pe_mode="reference_batch" if args.reference_pe else "timestep"))
        params = load_model_params(cfg, args, model, codec, args.mode or "test")
        if args.int8:
            if args.rollout == "cached":
                from sd_video_gen_tpu.ops.cached_rollout import (
                    quantize_rollout_params)
                params = jax.jit(quantize_rollout_params)(params)
            else:
                from sd_video_gen_tpu.ops.quantized import (
                    quantize_frame_transformer)
                params = jax.jit(quantize_frame_transformer)(params)

    refine_fn = None
    if args.denoise:
        from sd_video_gen_tpu.diffusion.refine import make_denoise_refiner
        from sd_video_gen_tpu.diffusion.sd import SDPipeline
        from sd_video_gen_tpu.diffusion import weights as W
        load = lambda p, conv: conv(W.load_state_dict(p)) if p else None
        pipe = SDPipeline(
            frame_size=512,
            vae_params=load(args.vae_weights, W.convert_vae),
            unet_params=load(args.unet_weights, W.convert_unet),
            clip_params=load(args.clip_weights, W.convert_clip_text),
            tokenizer_dir=args.tokenizer_dir,
            dtype=jnp.bfloat16 if args.denoise_precision == "bf16"
            else jnp.float32)
        refine_fn = make_denoise_refiner(cfg, args.denoise_start_step,
                                         pipeline=pipe,
                                         sampler=args.denoise_sampler,
                                         solver_steps=args.denoise_solver_steps)

    mesh = model_par = None
    if args.mesh:
        # multi-chip serving: transformer params replicate, the clip batch
        # shards over the data axis, and — when the mesh has a model axis and
        # --denoise is on — the UNet/VAE refiner params shard tensor-parallel
        # (parallel/sharding.diffusion_param_shardings) so one denoise stream
        # spans chips. head_sharded_attention lets the Pallas flash kernel
        # run per-device on its head shard (GSPMD cannot partition a
        # pallas_call on its own — ops/attention.py).
        from sd_video_gen_tpu.parallel import (make_mesh,
                                               diffusion_param_shardings)
        mesh = make_mesh(args.mesh)
        model_par = dict(zip(mesh.axis_names,
                             mesh.devices.shape)).get("model", 1) > 1
        if model_par and refine_fn is not None:
            ra, rp = refine_fn
            refine_fn = (ra, jax.device_put(
                rp, diffusion_param_shardings(mesh, rp)))

    # --naive = the pure copy-last-frame control (predict_naive_and_mnist):
    # never wrap Identity with the diff residual add (see predict_fvd.py)
    naive_mode = "ar" if (args.naive and args.train_mode == "diff") \
        else args.train_mode
    predict = make_predict_fn(model, codec, args.pred_frames,
                              window=cfg.frames_per_clip,
                              mode=naive_mode, refiner=refine_fn,
                              rollout=args.rollout,
                              int8=args.int8 and not args.naive,
                              future_horizon=cfg.frames_to_predict)

    embedder = None
    if args.train_mode == "text":
        from sd_video_gen_tpu.models.text_embed import ClassNameEmbedder
        embedder = (ClassNameEmbedder.from_npy(args.text_table)
                    if getattr(args, "text_table", None)
                    else ClassNameEmbedder(101, 384))

    if mesh is not None:
        from sd_video_gen_tpu.parallel import batch_sharding, replicated
        from sd_video_gen_tpu.ops.attention import head_sharded_attention
        params = jax.device_put(params, replicated(mesh))
        base_predict = predict
        b_shard = batch_sharding(mesh)

        def predict(p, frames, text_embeds=None):
            frames = jax.device_put(frames, b_shard)
            if text_embeds is not None:
                text_embeds = jax.device_put(text_embeds, b_shard)
            if model_par:
                # trace-time switch: keep the context active on every call
                with head_sharded_attention(mesh):
                    return base_predict(p, frames, text_embeds)
            return base_predict(p, frames, text_embeds)

    codec_params_main = getattr(codec, "params", None)

    @jax.jit
    def decode_impl(cparams, flat):
        # one compiled program per shape — an eager VAE decode dispatches
        # hundreds of ops per batch (predict_fvd uses the same pattern)
        if cparams is not None:
            return codec.decode_latents(flat, params=cparams)
        return codec.decode_latents(flat)

    if args.serve:
        # persistent serving: no dataset — clip batches arrive over the
        # socket; the compile/trace/first-round tax is paid once, in the
        # warmup batch, before SERVE_READY (predict/serve.py)
        from sd_video_gen_tpu.predict.serve import serve
        serve(args.serve, predict, lambda flat: decode_impl(
                  codec_params_main, flat), params,
              batch_clips=args.batch_clips,
              frames_per_clip=cfg.frames_per_clip,
              frame_size=cfg.frame_size, embedder=embedder)
        return

    # single-shot modes: build_dataset's future/learned_tgt extension adds
    # the GT future frames to every clip for TRAINING; the predict CLI must
    # feed only the context — a maskless single-shot forward over the
    # extended clip would attend the very frames it claims to predict
    exact = (cfg.frames_per_clip
             if args.train_mode in ("future", "learned_tgt") else None)
    dataset = build_dataset(cfg, args,
                            "test" if args.mode != "train" else "train",
                            exact_frames=exact)
    n_clips = min(len(dataset), args.max_clips)
    n_done = 0
    n_batches = 0
    first_sync_s = None  # end of the first completed batch (trace+compile
    #                      +first device round live in this window)
    stage_s = {"data": 0.0, "dispatch": 0.0, "decode": 0.0, "io": 0.0}
    t_start = time.perf_counter()

    def process(pending):
        """Fetch, decode, and write one completed batch (host side)."""
        nonlocal n_done, first_sync_s
        context, preds, n_items = pending
        t2 = time.perf_counter()
        # sequence layout matching the reference output: context minus last
        # frame, then predictions (prediction/predict.py:193)
        all_latents = jnp.concatenate([context[:, :-1], preds], axis=1)
        is_pred = ([False] * (context.shape[1] - 1)
                   + [True] * preds.shape[1])
        T_out = all_latents.shape[1]
        imgs = np.asarray(decode_impl(
            codec_params_main,
            all_latents.reshape(-1, codec.latent_dim)))
        t3 = time.perf_counter()
        for b in range(n_items):
            clip_imgs = imgs[b * T_out:(b + 1) * T_out]
            if args.save_output:
                folder = save_frames(clip_imgs, is_pred)
                print("saved to:", folder)
            if args.show:
                show_frames(clip_imgs, is_pred, args.fullscreen)
            n_done += 1
        stage_s["decode"] += t3 - t2
        stage_s["io"] += time.perf_counter() - t3
        if first_sync_s is None:
            first_sync_s = time.perf_counter() - t_start

    # Serving path: clips are batched through ONE jitted rollout program
    # (the reference looped batch_size=1 — prediction/predict.py:58), and
    # the loop is software-pipelined one batch deep: JAX dispatch is async,
    # so batch i's fetch/decode/PNG-write on the host overlaps batch i+1's
    # rollout on the device (the reference blocked on .cpu() per clip).
    pending = None
    for start in range(0, n_clips, args.batch_clips):
        n_batches += 1
        t0 = time.perf_counter()
        idxs = range(start, min(start + args.batch_clips, n_clips))
        items = [dataset[i] for i in idxs]
        frames = jnp.asarray(np.stack([it[1] for it in items]))
        text_embeds = None
        if embedder is not None:
            labels = [int(it[0][0]) if isinstance(it[0], (list, tuple)) else 0
                      for it in items]
            text_embeds = embedder(jnp.asarray(labels, jnp.int32))
        t1 = time.perf_counter()
        context, preds = predict(params, frames, text_embeds)
        stage_s["data"] += t1 - t0
        stage_s["dispatch"] += time.perf_counter() - t1
        if pending is not None:
            process(pending)  # previous batch: device work already done
        pending = (context, preds, len(items))
    if pending is not None:
        process(pending)
    print(f"predicted {args.pred_frames} frames for {n_done} clips")
    if args.timing:
        print(json.dumps({
            "stage_s": {k: round(v, 3) for k, v in stage_s.items()},
            "total_s": round(time.perf_counter() - t_start, 3),
            "clips": n_done, "pred_frames_per_clip": args.pred_frames,
            "batches": n_batches,
            # steady-state window = everything after the FIRST batch's
            # results were fetched: jit trace + XLA compile + the first
            # device round all land before that timestamp, so
            # (clips - batch_1) * pred_frames / (total - first_sync) is the
            # warm serving rate (tools/bench_cli_serving.py computes it)
            "first_sync_s": (round(first_sync_s, 3)
                             if first_sync_s is not None else None),
            "note": "dispatch includes jit trace/compile on the first "
                    "batch; device rollout time hides inside decode "
                    "(async-pipelined loop)"}))


if __name__ == "__main__":
    main()
