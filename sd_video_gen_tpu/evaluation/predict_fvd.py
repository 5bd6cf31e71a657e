"""Rollout + FVD evaluation CLI.

One script with flags replaces the reference's four near-clone harnesses
(evaluation/predict_fvd.py, predict_fvd2.py, predict_fvd2_denoise.py,
prediction/predict_naive_fvd.py):
  --fvd_api streaming : stylegan-lineage FeatureStats + scipy sqrtm
  --fvd_api batch     : VideoGPT-lineage logit collection + SVD Fréchet
  --naive             : Identity copy-baseline control
  --denoise           : per-frame partial-denoise refinement
  --train_mode text   : text-conditioned model (predict_fvd2_denoise.py:48-)

Per batch: GT clips (context + pred_frames long) stream through I3D into the
real stats; rollouts of the same contexts decode to pixels and stream into
the generated stats. FVD prints every --fvd_every batches (reference printed
every 100 clips — evaluation/predict_fvd.py:245-247) and at the end.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.codecs import make_codec
from sd_video_gen_tpu.config import build_arg_parser, load_config
from sd_video_gen_tpu.data.pipeline import BatchLoader
from sd_video_gen_tpu.evaluation.fvd import (FeatureStats, compute_fvd,
                                             frechet_distance,
                                             preprocess_videos)
from sd_video_gen_tpu.models import (FrameTransformer, FrameTransformerConfig,
                                     IdentityModel)
from sd_video_gen_tpu.models.i3d import InceptionI3d, I3DConfig, convert_i3d
from sd_video_gen_tpu.predict.predict import load_model_params, make_predict_fn
from sd_video_gen_tpu.train.trainer import build_dataset


def load_i3d(weights_path: str | None):
    i3d = InceptionI3d(I3DConfig())
    if weights_path:
        import torch
        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        params = convert_i3d(sd)
    else:
        warnings.warn("no I3D weights — random init; FVD values are only "
                      "self-consistent, not comparable to published numbers")
        # materialize from abstract shapes: a real .init would run the full
        # 224px forward just to produce parameters
        # (I3D needs >=9 frames and >=224px for the final (2,7,7) VALID pool)
        x = jnp.zeros((1, 9, 224, 224, 3))
        shapes = jax.eval_shape(i3d.init, jax.random.PRNGKey(0), x)
        flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
        treedef = jax.tree_util.tree_structure(shapes)

        # one jitted dispatch: materializing ~200 leaves eagerly costs a
        # remote-compile round trip per op on the dev tunnel
        @jax.jit
        def materialize(key):
            keys = jax.random.split(key, len(flat))
            leaves = []
            for k, (path, l) in zip(keys, flat):
                name = str(path[-1])
                if "bn_var" in name or "bn_scale" in name:
                    leaves.append(jnp.ones(l.shape, l.dtype))  # var must be >0
                else:
                    leaves.append(jax.random.normal(k, l.shape, l.dtype) * 0.05)
            return leaves

        params = jax.tree_util.tree_unflatten(treedef,
                                              materialize(jax.random.PRNGKey(0)))
    return i3d, params


def make_sharded_features(i3d, mesh):
    """Device-parallel I3D feature extraction + FeatureStats psum.

    Replaces the reference's DEAD distributed stats code
    (evaluation/fvd.py:135-145 torch.distributed.broadcast, never reached)
    with a real shard_map: each device preprocesses + I3D-forwards its batch
    shard and the (n, Σx, Σxxᵀ) accumulators are psum'd over the 'data' axis,
    so every device holds the global stats.

    Returns fn(i3d_params, videos_u8 (B,T,H,W,3)) -> FeatureStats with the
    batch sharded over mesh's 'data' axis (B must divide by it).
    """
    from functools import partial
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_data = mesh.shape["data"]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P("data")), out_specs=P())
    def _run(i3d_params, videos_u8):
        f = i3d.apply(i3d_params, preprocess_videos(videos_u8))
        st = FeatureStats(400).append(f)
        st = st.psum("data")
        return st.n, st.raw_sum, st.raw_prod

    def features_stats(i3d_params, videos_u8):
        if videos_u8.shape[0] % n_data:
            raise ValueError(
                f"batch {videos_u8.shape[0]} not divisible by data axis "
                f"{n_data}; pick --batch_clips as a multiple")
        n, s, p = _run(i3d_params, videos_u8)
        return FeatureStats(400, n, s, p)

    return features_stats


def main(argv=None):
    from sd_video_gen_tpu.utils.backend import honor_platform_pin
    from sd_video_gen_tpu.utils.cache import enable_compilation_cache
    honor_platform_pin()
    enable_compilation_cache()
    parser = build_arg_parser()
    parser.add_argument("--train_mode", type=str, default="ar",
                        choices=["ar", "future", "diff", "text",
                                 "learned_tgt"])
    parser.add_argument("--codec", type=str, default="pixel")
    parser.add_argument("--naive", type=lambda s: s.lower() == "true",
                        default=False)
    parser.add_argument("--max_clips", type=int, default=64)
    parser.add_argument("--batch_clips", type=int, default=8)
    parser.add_argument("--fvd_api", type=str, default="streaming",
                        choices=["streaming", "batch"])
    parser.add_argument("--fvd_every", type=int, default=8)
    parser.add_argument("--i3d_weights", type=str, default=None)
    parser.add_argument("--reference_pe", action="store_true",
                        help="serve with the reference's per-batch-index "
                             "positional encoding (compat for converted "
                             "reference checkpoints; see predict CLI)")
    parser.add_argument("--text_table", type=str, default=None,
                        help="npy table from tools/export_text_embeddings.py "
                             "(exact MiniLM class embeddings); default is "
                             "the hash-seeded fallback table")
    parser.add_argument("--denoise_sampler", type=str, default="ddim",
                        choices=["ddim", "dpmpp"],
                        help="ddim = reference-parity tail; dpmpp = "
                             "DPM-Solver++(2M) over the same interval in "
                             "~half the UNet evals (see predict CLI) — lets "
                             "FVD score the fast-sampler serving config")
    parser.add_argument("--denoise_solver_steps", type=int, default=None)
    # the reference eval harness hardcodes start_step=48 (2 refine steps of
    # 50) — the predict CLI's default 40 would silently over-denoise eval
    parser.set_defaults(denoise_start_step=48)
    args = parser.parse_args(argv)
    if args.mesh and args.fvd_api != "streaming":
        parser.error("--mesh implies --fvd_api streaming (psum'd "
                     "FeatureStats)")
    if args.pred_frames <= 1:
        args.pred_frames = 4
    cfg = load_config(args.config, args.config_dir)
    # I3D's temporal stack needs >= 9 frames end to end (stride-2 conv,
    # two stride-2 pools, then a kernel-2 VALID avg pool): shorter clips
    # produce an empty time axis and a silent NaN FVD
    total = cfg.frames_per_clip + args.pred_frames
    if total < 9:
        parser.error(
            f"frames_per_clip ({cfg.frames_per_clip}) + pred_frames "
            f"({args.pred_frames}) = {total} < 9, the I3D temporal minimum "
            "— raise --pred_frames or use a config with longer clips")

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

    refiner = None
    if args.denoise:
        # native-resolution partial denoise, the eval-harness variant
        # (evaluation/predict_fvd.py hardcodes start_step=48, no 512 upscale)
        from sd_video_gen_tpu.diffusion.refine import make_denoise_refiner
        from sd_video_gen_tpu.diffusion.sd import SDPipeline
        from sd_video_gen_tpu.diffusion import weights as W
        load = lambda p, conv: conv(W.load_state_dict(p)) if p else None
        pipe = SDPipeline(frame_size=cfg.frame_size,
                          vae_params=load(args.vae_weights, W.convert_vae),
                          unet_params=load(args.unet_weights, W.convert_unet),
                          clip_params=load(args.clip_weights,
                                           W.convert_clip_text),
                          dtype=jnp.bfloat16
                          if args.denoise_precision == "bf16"
                          else jnp.float32)
        refiner = make_denoise_refiner(cfg, args.denoise_start_step,
                                       pipeline=pipe, hi_res=None,
                                       sampler=args.denoise_sampler,
                                       solver_steps=args.denoise_solver_steps)

    i3d, i3d_params = load_i3d(args.i3d_weights)
    # --naive is the reference's pure copy-last-frame control
    # (prediction/predict_naive_fvd.py): the diff mode's residual add must
    # NOT wrap it — Identity + last latent doubles the latent and scores a
    # different (accidentally stronger under random-I3D FVD) baseline
    naive_mode = "ar" if (args.naive and args.train_mode == "diff") \
        else args.train_mode
    predict = make_predict_fn(model, codec, args.pred_frames,
                              window=cfg.frames_per_clip,
                              mode=naive_mode, refiner=refiner,
                              future_horizon=cfg.frames_to_predict)

    if args.mesh:
        # device-parallel feature extraction: per-device I3D shards + psum
        from sd_video_gen_tpu.parallel import make_mesh
        sharded_stats = make_sharded_features(i3d, make_mesh(args.mesh))
        features = None
    else:
        sharded_stats = None

        @jax.jit
        def features(videos_u8):
            return i3d.apply(i3d_params, preprocess_videos(videos_u8))

    codec_params = getattr(codec, "params", None)

    @jax.jit
    def decode_impl(cparams, flat):
        if cparams is not None:
            return codec.decode_latents(flat, params=cparams)
        return codec.decode_latents(flat)

    embedder = None
    if args.train_mode == "text":
        from sd_video_gen_tpu.models.text_embed import ClassNameEmbedder
        embedder = (ClassNameEmbedder.from_npy(args.text_table)
                    if args.text_table else ClassNameEmbedder(101, 384))

    def gen_video(params, context_frames, indices):
        """context uint8 -> [context + decoded predictions] uint8 video.

        Composed from the already-jitted predict/decode programs eagerly —
        wrapping them in one more jit would re-embed the codec weights as
        constants of the outer jaxpr."""
        text_embeds = None
        if embedder is not None:
            labels = [int(i[0]) if isinstance(i, (list, tuple)) else 0
                      for i in indices]
            text_embeds = embedder(jnp.asarray(labels, jnp.int32))
        _, preds = predict(params, context_frames, text_embeds)
        B, P, L = preds.shape
        dec = decode_impl(codec_params, preds.reshape(B * P, L))
        dec = dec.reshape(B, P, *dec.shape[1:])
        return jnp.concatenate([context_frames, dec], axis=1)

    # GT clips span context + predicted horizon. exact_frames pins the clip
    # length so build_dataset's mode-based extensions (future/learned_tgt,
    # Kitti's unconditional +frames_to_predict) cannot stack on top of the
    # horizon we already added here.
    dataset = build_dataset(cfg, args, "test" if args.mode != "train"
                            else "train",
                            exact_frames=cfg.frames_per_clip
                            + args.pred_frames)
    loader = BatchLoader(dataset, args.batch_clips, epoch_ratio=1.0,
                         shuffle=False, drop_last=False)

    st_real, st_gen = FeatureStats(400), FeatureStats(400)
    logits_real, logits_gen = [], []
    n_clips = 0
    mse_sum, mse_n = 0.0, 0  # pixel MSE in [0,1] over the predicted horizon
    n_data = 1
    if args.mesh:
        from sd_video_gen_tpu.parallel.mesh import parse_mesh_spec, AXIS_DATA
        n_data = parse_mesh_spec(args.mesh)[AXIS_DATA]
    for bi, (indices, frames) in enumerate(loader):
        if n_clips >= args.max_clips:
            break
        if args.mesh and frames.shape[0] % n_data:
            # ragged tail under a data-parallel mesh: trim to a shardable
            # size instead of crashing after most clips were processed
            keep = (frames.shape[0] // n_data) * n_data
            print(f"[mesh] trimming ragged tail batch {frames.shape[0]} "
                  f"-> {keep} (data axis {n_data})")
            if keep == 0:
                continue
            frames, indices = frames[:keep], list(indices)[:keep]
        frames = jnp.asarray(frames)
        context = frames[:, :cfg.frames_per_clip]
        gen = gen_video(params, context, indices)
        diff = (gen[:, cfg.frames_per_clip:].astype(jnp.float32)
                - frames[:, cfg.frames_per_clip:].astype(jnp.float32)) / 255.0
        mse_sum += float(jnp.sum(diff * diff))
        mse_n += diff.size
        if sharded_stats is not None:
            # (--mesh + --fvd_api batch is rejected at parse time)
            st_real = st_real.merge(sharded_stats(i3d_params, frames))
            st_gen = st_gen.merge(sharded_stats(i3d_params, gen))
        elif args.fvd_api == "streaming":
            st_real = st_real.append(features(frames))
            st_gen = st_gen.append(features(gen))
        else:
            logits_real.append(np.asarray(features(frames)))
            logits_gen.append(np.asarray(features(gen)))
        n_clips += frames.shape[0]
        if (bi + 1) % args.fvd_every == 0:
            print(f"[{n_clips} clips] FVD so far: {_fvd(args, st_real, st_gen, logits_real, logits_gen):.3f}")

    fvd = _fvd(args, st_real, st_gen, logits_real, logits_gen)
    mse = mse_sum / max(mse_n, 1)
    print(f"FVD ({args.fvd_api}, {n_clips} clips): {fvd:.3f}  "
          f"pred MSE: {mse:.5f}")
    return fvd, mse


def _fvd(args, st_real, st_gen, logits_real, logits_gen):
    if args.fvd_api == "streaming":
        return compute_fvd(st_real, st_gen)
    return frechet_distance(np.concatenate(logits_real),
                            np.concatenate(logits_gen))


if __name__ == "__main__":
    main()
