"""One Trainer with strategy flags, replacing the reference's five near-clone
trainer scripts (SURVEY.md §2.2).

Strategy modes (``--train_mode``):
  - 'ar'     : teacher-forced next-frame AR (trainers/trainer.py:111-190):
               src = [SOS + frames], tgt = seq[:-1], target = seq[1:], causal
               mask, loss on the last ``frames_to_predict`` positions.
  - 'future' : k-step single-shot (trainers/trainer_predict_future.py:121-146):
               no SOS, y_input = seq[:, :-k], target = seq[:, -k:], no mask.
  - 'diff'   : residual prediction (trainers/trainer_diff.py:140-142): model
               output for the last k positions is added to the previous-frame
               latents before the loss.
  - 'text'   : class-name conditioning (trainers/trainer_text.py:151-177):
               per-batch class-id -> text-embedding lookup, on device.
  - 'learned_tgt': DETR-style learned decoder queries
               (models/transformer_learned_tgt.py — the reference shipped
               the model with no trainer); trains with the 'future' split.

TPU-first design vs the reference hot loop (SURVEY.md §3.1):
  - frames cross host->device ONCE per step as uint8; normalize + latent
    encode + forward + loss + Adam update are a single jitted program.
  - loss components are accumulated on device and fetched once per epoch —
    no per-step ``.item()`` syncs (the reference did 4+/step).
  - the step is sharded over a Mesh: batch over 'data', tensor-parallel
    params over 'model' (parallel/sharding.py); XLA inserts the gradient
    psums and TP all-reduces.
"""

from __future__ import annotations

import math
import os
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from sd_video_gen_tpu.codecs import make_codec
from sd_video_gen_tpu.config import Config, parse_config_args, sweep_grid, build_arg_parser
from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.models.text_embed import ClassNameEmbedder
from sd_video_gen_tpu.ops import causal_mask, composite_loss, LossWeights
from sd_video_gen_tpu.parallel import make_mesh, param_shardings, batch_sharding
from sd_video_gen_tpu.train import checkpoint as ckpt
from sd_video_gen_tpu.train.metrics import MetricsLogger


class TrainState(train_state.TrainState):
    pass


def encode_or_passthrough(codec, batch, use_sos: bool, codec_params=None):
    """uint8 frames (B,T,H,W,3) -> latents via codec; f32 (B,T,L) batches
    (from a LatentCacheDataset) pass through with only SOS handling.

    ``codec_params`` threads VAE weights through jit boundaries as arguments
    (closing over an 84M-param tree embeds ~336MB of jaxpr constants)."""
    from sd_video_gen_tpu.codecs import add_sos
    if batch.ndim == 3:  # pre-encoded latents
        return add_sos(batch) if use_sos else batch
    if codec_params is not None:
        return codec.encode_batch(batch, use_sos=use_sos, params=codec_params)
    return codec.encode_batch(batch, use_sos=use_sos)


def _predictions_and_targets(model, params, latents, k, mode, rngs,
                             text_embeds=None, deterministic=False):
    """Shared forward logic for train and eval; returns (pred_k, target_k)."""
    kwargs = {}
    if text_embeds is not None:
        kwargs["text_embeds"] = text_embeds
    if mode in ("future", "learned_tgt"):
        # future: k-step single-shot (trainer_predict_future.py:121-146).
        # learned_tgt: the reference shipped no trainer for this variant;
        # the same split applies — the model ignores tgt and decodes its
        # own learned queries into exactly k outputs.
        y_in = latents[:, :-k]
        target = latents[:, -k:]
        pred = model.apply(params, y_in, y_in, tgt_mask=None,
                           deterministic=deterministic, rngs=rngs, **kwargs)
        return pred[:, -k:], target
    # ar / diff / text share the teacher-forced layout.
    y_in = latents[:, :-1]
    y_exp = latents[:, 1:]
    mask = causal_mask(y_in.shape[1])
    pred = model.apply(params, latents, y_in, tgt_mask=mask,
                       deterministic=deterministic, rngs=rngs, **kwargs)
    pred_k = pred[:, -k:]
    if mode == "diff":
        # add previous-frame latents (trainers/trainer_diff.py:140-142)
        pred_k = pred_k + latents[:, -(k + 1):-1]
    return pred_k, y_exp[:, -k:]


def make_train_step(model, codec, loss_w: LossWeights, cfg: Config,
                    mode: str = "ar", lr: float | None = None,
                    tx: optax.GradientTransformation | None = None,
                    mu_dtype=None):
    """Build (init_fn, step_fn). step_fn: (state, frames_u8, rng[, text]) -> (state, metrics).

    ``mu_dtype`` is forwarded to optax.adam (bf16 first moments halve the
    optimizer's HBM traffic — the flagship step is weight-bandwidth-bound,
    BASELINE.md). Loss terms are always computed in f32 regardless of the
    model's compute dtype.
    """
    k = cfg.frames_to_predict
    use_sos = mode not in ("future", "learned_tgt")
    tx = tx or optax.adam(lr if lr is not None else cfg.lr, mu_dtype=mu_dtype)
    codec_params = getattr(codec, "params", None)

    def init_fn(rng, sample_frames, text_embeds=None):
        latents = encode_or_passthrough(codec, jnp.asarray(sample_frames),
                                        use_sos, codec_params)
        if mode in ("future", "learned_tgt"):
            src = latents[:, :-k]
            variables = model.init(rng, src, src, tgt_mask=None,
                                   text_embeds=text_embeds)
        else:
            y_in = latents[:, :-1]
            variables = model.init(rng, latents, y_in,
                                   tgt_mask=causal_mask(y_in.shape[1]),
                                   text_embeds=text_embeds)
        return TrainState.create(apply_fn=model.apply, params=variables,
                                 tx=tx)

    def loss_fn(params, frames, rng, text_embeds, cparams):
        latents = encode_or_passthrough(codec, frames, use_sos, cparams)
        pred_k, target_k = _predictions_and_targets(
            model, params, latents, k, mode, rngs={"dropout": rng},
            text_embeds=text_embeds, deterministic=False)
        # loss math in f32 even under bf16 compute (GDL diffs / NCE logits
        # lose real precision in bf16); no-op on the f32 path
        return composite_loss(pred_k.astype(jnp.float32),
                              target_k.astype(jnp.float32), loss_w)

    @partial(jax.jit, donate_argnums=(0,))
    def step_impl(state, frames, rng, text_embeds, cparams):
        rng = jax.random.fold_in(rng, state.step)
        (_, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frames, rng, text_embeds, cparams)
        state = state.apply_gradients(grads=grads)
        return state, comps

    def step_fn(state, frames, rng, text_embeds=None):
        return step_impl(state, frames, rng, text_embeds, codec_params)

    return init_fn, step_fn


def make_eval_step(model, codec, loss_w: LossWeights, cfg: Config,
                   mode: str = "ar"):
    k = cfg.frames_to_predict
    use_sos = mode not in ("future", "learned_tgt")
    codec_params = getattr(codec, "params", None)

    @jax.jit
    def eval_impl(params, frames, text_embeds, cparams):
        latents = encode_or_passthrough(codec, frames, use_sos, cparams)
        pred_k, target_k = _predictions_and_targets(
            model, params, latents, k, mode, rngs=None,
            text_embeds=text_embeds, deterministic=True)
        # f32 loss math like the train side: bf16 GDL diffs / NCE logits
        # would make val_loss (and save_best decisions) noisy
        _, comps = composite_loss(pred_k.astype(jnp.float32),
                                  target_k.astype(jnp.float32), loss_w)
        return comps

    def eval_fn(params, frames, text_embeds=None):
        return eval_impl(params, frames, text_embeds, codec_params)

    return eval_fn


class Trainer:
    """Fit a FrameTransformer on a frame dataset; owns state/ckpt/metrics."""

    def __init__(self, cfg: Config, args=None, mode: str = "ar",
                 codec_kind: str = "pixel", mesh=None, model_cfg=None,
                 checkpoint_dir: str = "./checkpoints", run_name=None,
                 use_wandb: bool = True, num_classes: int = 101,
                 vae_params=None, precision: str | None = None):
        self.cfg = cfg
        self.args = args
        self.mode = mode
        # --precision: f32 (default) | bf16 (bf16 compute, f32 master params
        # + f32 moments — the safe mixed-precision default) | bf16_full
        # (bf16 params AND bf16 Adam mu: max HBM-bandwidth savings on the
        # weight-bound flagship step; documented numerics caveat).
        self.precision = (precision if precision is not None
                          else getattr(args, "precision", "f32") or "f32")
        if self.precision not in ("f32", "bf16", "bf16_full"):
            raise ValueError(f"unknown precision {self.precision}")
        if mesh is not None:
            self.mesh = mesh
        else:
            spec = getattr(args, "mesh", None) if args else None
            if spec:
                self.mesh = make_mesh(spec)
            else:
                from sd_video_gen_tpu.parallel.mesh import default_mesh_for_batch
                self.mesh = default_mesh_for_batch(cfg.batch_size)
        self.codec = make_codec(cfg, codec_kind, vae_params=vae_params)
        mc = model_cfg or FrameTransformerConfig.from_config(
            cfg, mode=mode if mode in ("future", "learned_tgt", "text") else "ar")
        if self.precision != "f32" and model_cfg is None:
            import dataclasses
            mc = dataclasses.replace(
                mc, dtype=jnp.bfloat16,
                param_dtype=(jnp.bfloat16 if self.precision == "bf16_full"
                             else jnp.float32))
        self.model = FrameTransformer(mc)
        self.loss_w = LossWeights.from_config(cfg)
        self.text_embedder = (ClassNameEmbedder(num_classes, mc.text_embed_dim)
                              if mode == "text" else None)
        self._text_table_np = None

        # multi-host SPMD: every process runs this same Trainer; batches are
        # assembled from per-process loader shards (parallel/multihost.py),
        # and only the coordinator logs/stamps.
        self.is_coordinator = jax.process_index() == 0
        self.multihost = jax.process_count() > 1

        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.index = ckpt.checkpoint_index(checkpoint_dir, cfg.config_name)
        self.run_name = run_name or f"{cfg.config_name}_{self.index}"
        debug = bool(getattr(args, "debug", False)) if args else False
        self.logger = MetricsLogger(
            self.run_name,
            use_wandb=use_wandb and not debug and self.is_coordinator,
            quiet=not self.is_coordinator)

        self._init_fn, self._step_fn = make_train_step(
            self.model, self.codec, self.loss_w, cfg, mode,
            mu_dtype=(jnp.bfloat16 if self.precision == "bf16_full"
                      else None))
        self._eval_fn = make_eval_step(self.model, self.codec, self.loss_w,
                                       cfg, mode)
        self.state = None
        self.best_train = float("inf")
        self.best_val = float("inf")

    # -- state management ---------------------------------------------------
    def init_state(self, sample_frames, seed: int = 0,
                   sample_text_embeds=None):
        # jit: a single compiled dispatch. Eager init dispatches every op
        # separately — through the dev tunnel's remote-compile path that is
        # minutes-to-hours for a few hundred ops (observed hanging the
        # trainer_fvd drive inside model.init).
        self.state = jax.jit(self._init_fn)(jax.random.PRNGKey(seed),
                                            jnp.asarray(sample_frames),
                                            sample_text_embeds)
        self._shard_state()
        n = sum(p.size for p in jax.tree.leaves(self.state.params))
        self.logger.log({"event": "init", "n_params": n})
        return self.state

    def _shard_state(self):
        shardings = param_shardings(self.mesh, self.state)
        if self.multihost:
            # every process holds an identical host-local copy (same seed,
            # same init program); device_put onto a mesh spanning processes
            # needs plain host arrays, each process materializing its own
            # addressable shards.
            self.state = jax.tree.map(np.asarray, self.state)
        self.state = jax.device_put(self.state, shardings)

    def resume(self, old_name: str):
        path = os.path.abspath(os.path.join(self.checkpoint_dir, old_name))
        # reference --resume loads a torch state_dict of the same name
        # (trainers/trainer.py:363) — accept those too, converting on the fly
        # (fresh optimizer state, like the reference's load_state_dict).
        pt = path if path.endswith(".pt") else path + ".pt"
        if not os.path.isdir(path) and os.path.isfile(pt):
            from sd_video_gen_tpu.diffusion.weights import (load_state_dict,
                                                            convert_exhaustive)
            mode = getattr(getattr(self.model, "cfg", None), "mode", "ar")
            params = convert_exhaustive("transformer", load_state_dict(pt),
                                        mode=mode)
            self.state = self.state.replace(params=params)
        else:
            self.state = ckpt.restore_checkpoint(path,
                                                 ckpt.abstract_like(self.state))
        self._shard_state()

    # -- loops --------------------------------------------------------------
    def _texts(self, indices):
        if self.text_embedder is None:
            return None
        ids = [i[0] if isinstance(i, (list, tuple)) else i for i in indices]
        # host-side table lookup: the embeddings must be host arrays for
        # the multihost global-batch assembly anyway, and a device-side
        # take would force a device->host round trip per step in
        # _put_texts (the exact per-step sync pattern this trainer exists
        # to avoid)
        if self._text_table_np is None:
            self._text_table_np = np.asarray(self.text_embedder.table)
        return self._text_table_np[np.asarray(ids, np.int64)]

    def _put_texts(self, indices):
        """Text embeddings aligned with the ASSEMBLED frame batch: under
        --multihost the frame batch is global, so the local embed slice must
        be assembled the same way (a local slice paired with a global batch
        is a shape mismatch — or worse, a silent mispairing)."""
        te = self._texts(indices)
        if te is None:
            return None
        return self._put_batch(np.asarray(te))

    def _put_batch(self, frames):
        if self.multihost:
            # frames here are THIS process's slice of the global batch
            # (BatchLoader process_shard); assemble the global array with
            # batch-over-'data' layout spanning all hosts' devices.
            from sd_video_gen_tpu.parallel.multihost import global_batch_from_local
            return global_batch_from_local(self.mesh, np.asarray(frames))
        return jax.device_put(jnp.asarray(frames), batch_sharding(self.mesh))

    def train_loop(self, loader, rng):
        from sd_video_gen_tpu.utils.profiling import StepTimer
        timer = StepTimer()
        sums, nb = None, 0
        for indices, frames in loader:
            timer.start()
            batch = self._put_batch(frames)
            self.state, comps = self._step_fn(self.state, batch, rng,
                                              self._put_texts(indices))
            timer.stop()
            sums = comps if sums is None else jax.tree.map(jnp.add, sums, comps)
            nb += 1
        means = jax.tree.map(lambda s: s / max(nb, 1), sums or {})
        # 'L1' capitalization matches the reference's metric names
        # (trainers/trainer.py:186)
        out = {f"{'L1' if k == 'l1' else k}_train": float(v)
               for k, v in means.items()}
        out.update(timer.summary())
        return out

    def validation_loop(self, loader):
        sums, nb = None, 0
        for indices, frames in loader:
            batch = self._put_batch(frames)
            comps = self._eval_fn(self.state.params, batch,
                                  self._put_texts(indices))
            sums = comps if sums is None else jax.tree.map(jnp.add, sums, comps)
            nb += 1
        if sums is None:
            import warnings
            warnings.warn(
                "validation epoch yielded no batches (dataset smaller than "
                "one mesh-shardable batch?) — val metrics report 0",
                stacklevel=2)
        means = jax.tree.map(lambda s: s / max(nb, 1), sums or {})
        return {f"{'L1' if k == 'l1' else k}_val": float(v)
                for k, v in means.items()}

    def fvd_validation(self, loader, i3d, i3d_params, max_batches: int = 8,
                       protocol: str = "last_k"):
        """In-training FVD on teacher-forced predictions.

        Reference: trainers/trainer_fvd.py:253-285 — every few epochs the
        validation decodes predicted latents to pixels, resizes to 224 and
        streams GT + predictions through I3D into FeatureStats.

        ``protocol`` selects which frames enter the statistics:
          - ``last_k``: the k predicted frames vs the last-k GT frames
            (cheapest; the r2 default, documented deviation in PARITY.md).
          - ``reference``: the reference's full-clip streaming — teacher-
            forced predictions at EVERY position vs the FULL GT clip
            (trainers/trainer_fvd.py:253-273 streams the whole ``batch``
            into the GT stats and the whole ``pred`` into the generated
            stats). T-frame clips yield T one-step predictions (the SOS
            token anchors position 0), so both streams carry T frames.
        Only ``ar``/``diff``/``text`` define full-sequence teacher forcing;
        ``future``/``learned_tgt`` emit exactly k frames, so ``reference``
        falls back to ``last_k`` there with a warning.
        """
        from sd_video_gen_tpu.evaluation.fvd import (FeatureStats, compute_fvd,
                                                     preprocess_videos)
        k = self.cfg.frames_to_predict
        if protocol not in ("last_k", "reference"):
            raise ValueError(f"unknown fvd protocol {protocol!r}")
        if protocol == "reference" and self.mode in ("future", "learned_tgt"):
            warnings.warn(
                f"fvd protocol 'reference' undefined for mode={self.mode} "
                "(single-shot models emit exactly k frames); using last_k",
                stacklevel=2)
            protocol = "last_k"

        def pad_time(v, min_t: int = 9):
            # The I3D graph needs T >= 9: its temporal pool chain collapses
            # shorter clips to zero frames and every feature becomes NaN
            # (measured: T=5..8 -> NaN, T=9 -> finite — an earlier min_t=5
            # assumption silently produced FVD=nan). 9 also matches the
            # reference's 9-frame validation-clip protocol
            # (trainers/trainer_fvd.py:487-490). Clips shorter than 9 are
            # tiled identically for real and generated — PARITY.md.
            if v.shape[1] >= min_t:
                return v
            reps = -(-min_t // v.shape[1])
            return jnp.tile(v, (1, reps, 1, 1, 1))[:, :min_t]

        codec_params = getattr(self.codec, "params", None)

        @jax.jit
        def fvd_batch(params, cparams, i3d_p, frames, text_embeds):
            latents = encode_or_passthrough(self.codec, frames,
                                            self.mode not in
                                            ("future", "learned_tgt"),
                                            cparams)
            kwargs = ({"text_embeds": text_embeds}
                      if text_embeds is not None else {})
            if protocol == "reference":
                # full-clip streaming: one-step predictions at every
                # position (SOS anchors position 0 -> T preds for T frames)
                # vs the whole GT clip, as trainer_fvd.py:253-273 does.
                y_in = latents[:, :-1]
                pred = self.model.apply(
                    params, latents, y_in,
                    tgt_mask=causal_mask(y_in.shape[1]), deterministic=True,
                    **kwargs)
                if self.mode == "diff":
                    # residual parameterization adds the previous-frame
                    # latent at every step (trainers/trainer_diff.py:140-142)
                    pred = pred + y_in
                real = frames
            else:
                pred, _ = _predictions_and_targets(
                    self.model, params, latents, k, self.mode, rngs=None,
                    text_embeds=text_embeds, deterministic=True)
                real = frames[:, -k:]
            B, T = pred.shape[:2]
            flat = pred.reshape(B * T, self.codec.latent_dim)
            dec = (self.codec.decode_latents(flat, params=cparams)
                   if cparams is not None else self.codec.decode_latents(flat))
            dec = dec.reshape(B, T, *dec.shape[1:])
            f_gen = i3d.apply(i3d_p, preprocess_videos(pad_time(dec)))
            f_real = i3d.apply(i3d_p, preprocess_videos(pad_time(real)))
            # fold the streaming-stats contributions into the SAME jit:
            # eager FeatureStats.append per batch costs a remote-compile
            # round trip per op on the dev tunnel
            return (f_real.sum(0), f_real.T @ f_real,
                    f_gen.sum(0), f_gen.T @ f_gen)

        import numpy as np
        n = 0
        acc = [np.zeros(400), np.zeros((400, 400)),
               np.zeros(400), np.zeros((400, 400))]
        for bi, (indices, frames) in enumerate(loader):
            if bi >= max_batches:
                break
            if np.ndim(frames) == 3:
                raise ValueError(
                    "in-training FVD needs PIXEL frames (I3D consumes "
                    "video), but the loader yields pre-encoded latents — "
                    "--latent_cache cannot be combined with --fvd_every")
            gb = self._put_batch(frames)
            te = self._put_texts(indices)
            out = fvd_batch(self.state.params, codec_params,
                            i3d_params, gb, te)
            for a, o in zip(acc, out):
                a += np.asarray(o, np.float64)
            # the assembled batch is GLOBAL under --multihost (every
            # process's shard); count its full leading dim, not the local
            # slice, or the Frechet means inflate by process_count
            n += int(gb.shape[0])
        st_r = FeatureStats(400, np.float64(n), acc[0], acc[1])
        st_g = FeatureStats(400, np.float64(n), acc[2], acc[3])
        return compute_fvd(st_r, st_g)

    def fit(self, train_loader, val_loader, epochs: int, seed: int = 0,
            save_best: bool = False, fvd_every: int = 0, fvd_i3d=None,
            ckpt_every: int = 1, fvd_protocol: str = "last_k"):
        rng = jax.random.PRNGKey(seed)
        if self.state is None:
            indices, frames = next(iter(train_loader))
            self.init_state(frames, seed, self._texts(indices))
        history = []
        try:
            for epoch in range(1, epochs + 1):
                train_m = self.train_loop(train_loader, rng)
                val_m = self.validation_loop(val_loader)
                metrics = {"epoch": epoch, **train_m, **val_m,
                           "train_loss": train_m.get("total_train", 0.0),
                           # an EMPTY val epoch must not report 0.0: under
                           # save_best that would pin best_val to 0.0 and
                           # crown a bogus 'best' forever (NaN never
                           # compares < best)
                           "val_loss": val_m.get("total_val", float("nan"))}
                # periodic in-training FVD (trainer_fvd.py:500 epoch%5==1 gate)
                if fvd_every and fvd_i3d is not None and (
                        fvd_every == 1 or epoch % fvd_every == 1):
                    metrics["FVD score"] = self.fvd_validation(
                        val_loader, *fvd_i3d, protocol=fvd_protocol)
                self.logger.log(metrics, step=int(self.state.step))
                history.append(metrics)
                # --ckpt_every: a full-TrainState save moves params + Adam
                # state (GBs at flagship scale); epoch-granular saving is a
                # reference behavior worth rate-limiting on slow links.
                # The final epoch always saves. save_best must see EVERY
                # epoch's metrics (it already rate-limits itself by writing
                # only on improvement) — gating it on ckpt_every would
                # silently skip the true best epoch and let a later, worse
                # epoch claim the 'best' checkpoint.
                if save_best or epoch % max(ckpt_every, 1) == 0 \
                        or epoch == epochs:
                    self._save(metrics, save_best)
            # drain in-flight async epoch saves before declaring fit done
            ckpt.finalize_saves()
        except (KeyboardInterrupt, SystemExit, Exception) as e:
            # failure/preemption handling: persist an emergency checkpoint
            # (params + opt state + step) so --resume continues exactly; the
            # reference could only reload weights and lost Adam moments
            # (SURVEY.md §5.3-5.4).
            if self.state is not None:
                path = self.save("interrupt")
                self.logger.log({"event": "interrupt",
                                 "error": type(e).__name__,
                                 "checkpoint": path})
            raise
        return history

    def _save(self, metrics, save_best: bool):
        # save-best on train and val separately, else save-last
        # (trainers/trainer.py:469-480 semantics). Epoch saves are ASYNC:
        # device arrays are copied to host, the disk write overlaps the next
        # epochs (a flagship TrainState moves ~5GB); fit() and the interrupt
        # path drain with ckpt.finalize_saves().
        if save_best:
            if metrics["train_loss"] < self.best_train:
                self.best_train = metrics["train_loss"]
                self.save("train", block=False)
            if metrics["val_loss"] < self.best_val:
                self.best_val = metrics["val_loss"]
                self.save("test", block=False)
        else:
            self.save("test", block=False)

    def save(self, mode_tag: str, block: bool = True):
        path = ckpt.checkpoint_path(self.checkpoint_dir, self.cfg.config_name,
                                    self.index, mode_tag)
        ckpt.save_checkpoint(path, self.state, block=block)
        return path


class _LabelMappedLoader:
    """Yield (labels, frames) from a NativeBatchLoader that yields clip
    indices, using ITS OWN split's clip->class table — the same contract
    BatchLoader provides for class datasets."""

    def __init__(self, loader):
        self.loader = loader
        self.labels = loader.labels

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for ids, frames in self.loader:
            yield [self.labels[int(i)] for i in ids], frames


def build_dataset(cfg: Config, args, stage: str, exact_frames: int | None = None):
    """Dataset dispatch mirroring trainers/trainer.py:372-439.

    ``exact_frames`` pins the clip length, overriding every mode-based
    extension (future/learned_tgt add frames_to_predict; Kitti always
    extends) — evaluation callers that compute their own GT horizon pass it
    so the length policy has exactly one owner and cannot double-apply.
    """
    from sd_video_gen_tpu.data import (BouncingBallDataset, KittiDataset,
                                       MovingMNISTDataset)
    name = args.dataset
    # future/learned_tgt train on the split src=clip[:-k], target=clip[-k:]
    # — clips must carry the k extra frames or the encoder input is EMPTY
    # (the UCF/Kitti branches already extend; ball/mnist crashed instead)
    ext = (cfg.frames_to_predict
           if getattr(args, "train_mode", "ar") in ("future", "learned_tgt")
           else 0)
    if name == "ball":
        return BouncingBallDataset(num_frames=exact_frames
                                   or (cfg.frames_per_clip + ext),
                                   stride=cfg.stride, dir=args.folder,
                                   stage=stage, seed=args.seed)
    if name == "kitti":
        return KittiDataset(
            num_frames=exact_frames
            or (cfg.frames_per_clip + cfg.frames_to_predict),
            stride=1, dir=args.folder, stage=stage,
            frame_size=cfg.frame_size, seed=args.seed)
    if name == "mnist":
        return MovingMNISTDataset(num_frames=exact_frames
                                  or (cfg.frames_per_clip + ext),
                                  stride=cfg.stride,
                                  path=args.folder or "mnist_test_seq.npy",
                                  stage=stage, seed=args.seed)
    if "ucf" in name:
        from sd_video_gen_tpu.data.ucf101 import UCF101Dataset
        return UCF101Dataset.from_args(cfg, args, stage,
                                       exact_frames=exact_frames)
    raise ValueError(f"unknown dataset {name}")


def main(argv=None):
    from sd_video_gen_tpu.utils.backend import honor_platform_pin
    from sd_video_gen_tpu.utils.cache import enable_compilation_cache
    honor_platform_pin()
    enable_compilation_cache()
    parser = build_arg_parser()
    # learned_tgt: the reference shipped the model variant
    # (models/transformer_learned_tgt.py) with no trainer for it; here it
    # trains via the 'future' layout (decoder input is the model's own
    # learned queries, so the future split applies).
    parser.add_argument("--train_mode", type=str, default="ar",
                        choices=["ar", "future", "diff", "text",
                                 "learned_tgt"])
    parser.add_argument("--codec", type=str, default="pixel",
                        choices=["pixel", "vae"])
    parser.add_argument("--sweep", action="store_true",
                        help="run the full YAML grid instead of the first point")
    parser.add_argument("--fvd_every", type=int, default=0,
                        help="compute FVD every N epochs (trainer_fvd mode)")
    parser.add_argument("--i3d_weights", type=str, default=None)
    parser.add_argument("--fvd_protocol", type=str, default="last_k",
                        choices=("last_k", "reference"),
                        help="in-training FVD frame selection: last_k "
                             "(k preds vs last-k GT) or reference "
                             "(full-clip streaming, trainer_fvd.py:253-273)")
    parser.add_argument("--latent_cache", type=str, default=None,
                        help="train from a utils/preprocess.py latent cache "
                             "dir instead of decoding frames")
    parser.add_argument("--native_cache", type=str, default=None,
                        help="feed batches through the C++ fastloader from a "
                             "data/native_loader.py frame cache dir")
    parser.add_argument("--ckpt_every", type=int, default=1,
                        help="checkpoint every N epochs (final epoch always "
                             "saves; a flagship TrainState save moves GBs). "
                             "--save_best True ignores this: best-mode "
                             "writes only on improvement already")
    parser.add_argument("--precision", type=str, default="f32",
                        choices=["f32", "bf16", "bf16_full"],
                        help="f32 | bf16 (bf16 compute, f32 master weights) "
                             "| bf16_full (bf16 weights + bf16 Adam mu: "
                             "fastest on the weight-bandwidth-bound step)")
    parser.add_argument("--multihost", action="store_true",
                        help="join a multi-process SPMD run "
                             "(jax.distributed.initialize): the mesh spans "
                             "all hosts' devices, each host loads only its "
                             "slice of every global batch")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port (auto-detected "
                             "on TPU pods)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args(argv)

    if args.multihost:
        # must run before any device query/computation
        from sd_video_gen_tpu.parallel import multihost
        multihost.initialize(args.coordinator, args.num_processes,
                             args.process_id)

    from sd_video_gen_tpu.config import load_config
    from sd_video_gen_tpu.data import BatchLoader

    grid = (sweep_grid(args.config, args.config_dir) if args.sweep
            else [load_config(args.config, args.config_dir)])
    vae_params = None
    if args.codec == "vae" and args.vae_weights:
        from sd_video_gen_tpu.diffusion.weights import (load_state_dict,
                                                        convert_vae)
        vae_params = convert_vae(load_state_dict(args.vae_weights))

    for cfg in grid:
        trainer = Trainer(cfg, args, mode=args.train_mode,
                          codec_kind=args.codec,
                          checkpoint_dir=args.checkpoint_dir,
                          vae_params=vae_params)
        # multi-host: every process derives the identical global epoch order
        # from the shared seed and loads only its contiguous slice of each
        # global batch (both loaders implement the same contract). The
        # divisibility requirement is the mesh's DATA axis (not total device
        # count), lcm'd with process count so per-process slices stay even.
        shard = ((jax.process_index(), jax.process_count())
                 if jax.process_count() > 1 else None)
        data_ax = trainer.mesh.shape.get("data", 1)
        mult = math.lcm(data_ax, shard[1]) if shard else data_ax
        if args.native_cache:
            from sd_video_gen_tpu.data.native_loader import NativeBatchLoader
            train_loader = NativeBatchLoader(
                args.native_cache, "train", cfg.batch_size,
                epoch_ratio=cfg.epoch_ratio, flip=args.flip, seed=args.seed,
                n_threads=max(1, cfg.num_workers),
                process_shard=shard, shard_multiple=mult)
            val_loader = NativeBatchLoader(
                args.native_cache, "test", cfg.batch_size,
                epoch_ratio=cfg.epoch_ratio, seed=args.seed,
                n_threads=max(1, cfg.num_workers),
                process_shard=shard, shard_multiple=mult)
            if args.train_mode == "text":
                if train_loader.labels is None or val_loader.labels is None:
                    raise ValueError(
                        "--train_mode text needs class labels, but this "
                        "native cache has none (built from a no-class "
                        "dataset, or predates label storage — rebuild it "
                        "with data.native_loader)")
                # native loaders yield clip indices; each SPLIT has its own
                # clip->class table (mapping val indices through the train
                # table would condition validation on wrong classes), so
                # wrap each loader to yield labels like BatchLoader does
                train_loader = _LabelMappedLoader(train_loader)
                val_loader = _LabelMappedLoader(val_loader)
        else:
            if args.latent_cache:
                from sd_video_gen_tpu.data.latent_cache import LatentCacheDataset
                train_ds = LatentCacheDataset(args.latent_cache, "train")
                val_ds = LatentCacheDataset(args.latent_cache, "test")
            else:
                train_ds = build_dataset(cfg, args, "train")
                val_ds = build_dataset(cfg, args, "test")
            train_loader = BatchLoader(train_ds, cfg.batch_size,
                                       epoch_ratio=cfg.epoch_ratio,
                                       seed=args.seed, process_shard=shard,
                                       shard_multiple=mult)
            val_loader = BatchLoader(val_ds, cfg.batch_size,
                                     epoch_ratio=cfg.epoch_ratio,
                                     seed=args.seed, process_shard=shard,
                                     shard_multiple=mult)
        if args.resume:
            indices, frames = next(iter(train_loader))
            trainer.init_state(frames, args.seed, trainer._texts(indices))
            trainer.resume(args.old_name)
        fvd_i3d = None
        if args.fvd_every:
            from sd_video_gen_tpu.evaluation.predict_fvd import load_i3d
            fvd_i3d = load_i3d(args.i3d_weights)
        trainer.fit(train_loader, val_loader, epochs=cfg.epochs,
                    seed=args.seed, save_best=args.save_best,
                    fvd_every=args.fvd_every, fvd_i3d=fvd_i3d,
                    ckpt_every=args.ckpt_every,
                    fvd_protocol=args.fvd_protocol)
        trainer.logger.close()


if __name__ == "__main__":
    main()
