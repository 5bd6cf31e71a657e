"""Prediction CLI paths not covered elsewhere: text-conditioned rollout,
MNIST + naive baseline, future single-shot."""

import numpy as np
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.codecs import PixelCodec
from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.models.text_embed import ClassNameEmbedder
from sd_video_gen_tpu.predict.predict import make_predict_fn


def _codec_and_frames(rng, B=1, T=5):
    codec = PixelCodec(32)
    frames = jnp.asarray(rng.integers(0, 255, (B, T, 32, 32, 3)).astype(np.uint8))
    return codec, frames


def test_text_mode_rollout(rng):
    codec, frames = _codec_and_frames(rng)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=32,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0,
                                mode="text", text_embed_dim=16)
    model = FrameTransformer(mc)
    emb = ClassNameEmbedder(5, 16)
    te = emb(jnp.asarray([2], jnp.int32))
    lat = codec.encode_batch(frames, use_sos=True)
    params = model.init(jax.random.PRNGKey(0), lat, lat[:, :-1],
                        text_embeds=te)
    predict = make_predict_fn(model, codec, pred_frames=3, window=5,
                              mode="text")
    ctx, preds = predict(params, frames, te)
    assert preds.shape == (1, 3, codec.latent_dim)
    # different class id conditions differently
    te2 = emb(jnp.asarray([4], jnp.int32))
    _, preds2 = predict(params, frames, te2)
    assert np.abs(np.asarray(preds) - np.asarray(preds2)).max() > 1e-5


def test_mnist_naive_prediction(rng, tmp_path):
    """predict_naive_and_mnist role: Identity baseline over MovingMNIST."""
    from sd_video_gen_tpu.data.frame_datasets import MovingMNISTDataset
    from sd_video_gen_tpu.models.identity import IdentityModel

    arr = rng.integers(0, 255, (10, 5, 32, 32)).astype(np.uint8)
    p = tmp_path / "mnist_test_seq.npy"
    np.save(p, arr)
    ds = MovingMNISTDataset(num_frames=5, path=str(p), stage="test",
                            shuffle=False)
    codec = PixelCodec(32)
    model = IdentityModel()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, codec.latent_dim)),
                        jnp.zeros((1, 2, codec.latent_dim)))
    predict = make_predict_fn(model, codec, pred_frames=3, window=5)
    _, frames = ds[0]
    ctx, preds = predict(params, jnp.asarray(frames)[None])
    # identity: every predicted latent equals the last context latent
    last = np.asarray(ctx[:, -1])
    for t in range(3):
        np.testing.assert_allclose(np.asarray(preds[:, t]), last, atol=1e-5)


def test_bf16_training_step(rng):
    """Flagship dtype path: bf16 compute + f32 params trains finitely."""
    from sd_video_gen_tpu.config import Config
    from sd_video_gen_tpu.ops import LossWeights
    from sd_video_gen_tpu.train.trainer import make_train_step

    cfg = Config(config_name="bf16", lr=1e-3, batch_size=2, frames_per_clip=5,
                 frames_to_predict=2, frame_size=32, use_contrastive=True,
                 lambda_contrastive=0.025)
    codec = PixelCodec(32)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=64,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.1,
                                dtype=jnp.bfloat16, param_dtype=jnp.float32)
    model = FrameTransformer(mc)
    w = LossWeights.from_config(cfg)
    init_fn, step_fn = make_train_step(model, codec, w, cfg)
    frames = jnp.asarray(rng.integers(0, 255, (2, 5, 32, 32, 3)).astype(np.uint8))
    state = init_fn(jax.random.PRNGKey(0), frames)
    # params stay f32 even with bf16 compute
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(state.params))
    l0 = None
    for i in range(3):
        state, comps = step_fn(state, frames, jax.random.PRNGKey(1))
        assert np.isfinite(float(comps["total"]))
        l0 = l0 or float(comps["total"])
    assert float(comps["total"]) < l0


def test_int8_full_rollout_predict(rng):
    """--int8 with the full re-forward rollout (quantized_ar_apply path)."""
    from sd_video_gen_tpu.ops.quantized import quantize_frame_transformer
    from sd_video_gen_tpu.predict.predict import make_predict_fn

    codec, frames = _codec_and_frames(rng)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=32,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0)
    model = FrameTransformer(mc)
    lat = codec.encode_batch(frames, use_sos=True)
    params = model.init(jax.random.PRNGKey(0), lat, lat[:, :-1])

    base = make_predict_fn(model, codec, pred_frames=3, window=5)
    _, preds_f32 = base(params, frames)

    qp = quantize_frame_transformer(params)
    q = make_predict_fn(model, codec, pred_frames=3, window=5, int8=True)
    _, preds_q = q(qp, frames)
    assert preds_q.shape == preds_f32.shape
    a, b = np.asarray(preds_q).ravel(), np.asarray(preds_f32).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99


def test_predict_cli_mesh_serving(tmp_path, monkeypatch):
    """The shipped predict CLI with --mesh: data-parallel clip sharding and
    a model-axis mesh (head-sharded attention context active) both run end
    to end on the virtual mesh."""
    import os

    from sd_video_gen_tpu.data.synthetic import generate_bouncing_ball_tree
    from sd_video_gen_tpu.predict.predict import main

    root = generate_bouncing_ball_tree(str(tmp_path / "ball"), 2, 2, 10, 32)
    (tmp_path / "configs").mkdir()
    (tmp_path / "configs" / "meshcfg.yml").write_text(
        "BATCH_SIZE:\n - 2\nFRAMES_PER_CLIP:\n - 5\nFRAMES_TO_PREDICT:\n"
        " - 2\nFRAME_SIZE: 32\nDIM_MODEL:\n - 32\nNUM_HEADS:\n - 4\n"
        "NUM_ENCODER_LAYERS:\n - 1\nNUM_DECODER_LAYERS:\n - 1\n")
    monkeypatch.chdir(tmp_path)  # outputs/ written under tmp
    for mesh in ("data=2,model=4", "data=1,model=8"):
        main(["--dataset", "ball", "--config", "meshcfg",
              "--config_dir", str(tmp_path / "configs"), "--folder", root,
              "--naive", "True", "--pred_frames", "2", "--max_clips", "2",
              "--batch_clips", "2", "--mesh", mesh,
              "--save_output", "True"])
        assert os.path.isdir(tmp_path / "outputs")


def test_future_mode_slice_alignment(rng):
    """pred_frames < frames_to_predict must take the FIRST pred_frames of
    the model's trained k-frame horizon — slicing [-pred_frames:] scored
    future frames (k-p+1..k) against GT frames (1..p), a silent temporal
    shift (review regression)."""
    codec, frames = _codec_and_frames(rng, T=6)
    k = 3
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=32,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0,
                                mode="future")
    model = FrameTransformer(mc)
    lat = codec.encode_batch(frames, use_sos=False)
    params = model.init(jax.random.PRNGKey(0), lat, lat)
    predict = make_predict_fn(model, codec, pred_frames=2, window=6,
                              mode="future", future_horizon=k)
    _, preds = predict(params, frames)
    full = model.apply(params, lat, lat, tgt_mask=None)
    np.testing.assert_allclose(np.asarray(preds),
                               np.asarray(full[:, -k:][:, :2]),
                               rtol=1e-5, atol=1e-5)
    # over-asking beyond the trained horizon is refused
    import pytest
    with pytest.raises(ValueError, match="horizon"):
        make_predict_fn(model, codec, pred_frames=4, window=6,
                        mode="future", future_horizon=k)


def test_learned_tgt_single_shot_predict(rng):
    """learned_tgt is single-shot like future (the model decodes its own
    learned queries); it previously fell through to the AR sliding-window
    rollout with meaningless feedback (review regression)."""
    codec, frames = _codec_and_frames(rng, T=6)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=32,
                                num_heads=4, num_encoder_layers=1,
                                num_decoder_layers=1, dropout_p=0.0,
                                mode="learned_tgt", frames_to_predict=3)
    model = FrameTransformer(mc)
    lat = codec.encode_batch(frames, use_sos=False)
    params = model.init(jax.random.PRNGKey(0), lat, lat)
    predict = make_predict_fn(model, codec, pred_frames=3, window=6,
                              mode="learned_tgt", future_horizon=3)
    _, preds = predict(params, frames)
    full = model.apply(params, lat, lat, tgt_mask=None)
    np.testing.assert_allclose(np.asarray(preds), np.asarray(full[:, -3:]),
                               rtol=1e-5, atol=1e-5)


def test_save_frames_no_collision(tmp_path, monkeypatch):
    """Folder naming must skip existing numbers: len(listdir) collided
    after deletions and silently overwrote a previous run's frames."""
    import os

    from sd_video_gen_tpu.predict.predict import save_frames

    monkeypatch.chdir(tmp_path)
    img = np.zeros((1, 8, 8, 3), np.uint8)
    os.makedirs("outputs/0")
    os.makedirs("outputs/2")  # gap at 1: len(listdir)==2 would collide
    f1 = save_frames(img, [False])
    f2 = save_frames(img, [False])
    assert f1 != f2
    assert not set(os.listdir(f1)) & set()  # wrote fresh dirs
    assert sorted(os.listdir("outputs")) == sorted(["0", "2",
                                                    os.path.basename(f1),
                                                    os.path.basename(f2)])


def test_timing_reports_steady_state_window(tmp_path, monkeypatch, capsys):
    """--timing must carry first_sync_s (end of the FIRST completed batch)
    and the batch count: tools/bench_cli_serving.py computes the warm
    serving rate as (clips - batch_1) * pred / (total - first_sync) — a
    missing or misplaced timestamp silently turns that into a
    compile-polluted number again (the r4 two-process measurement bug)."""
    import json

    from sd_video_gen_tpu.data.synthetic import generate_bouncing_ball_tree
    from sd_video_gen_tpu.predict.predict import main

    root = generate_bouncing_ball_tree(str(tmp_path / "ball"), 1, 2, 10, 32)
    (tmp_path / "configs").mkdir()
    (tmp_path / "configs" / "tcfg.yml").write_text(
        "BATCH_SIZE:\n - 2\nFRAMES_PER_CLIP:\n - 5\nFRAMES_TO_PREDICT:\n"
        " - 2\nFRAME_SIZE: 32\nDIM_MODEL:\n - 32\nNUM_HEADS:\n - 4\n"
        "NUM_ENCODER_LAYERS:\n - 1\nNUM_DECODER_LAYERS:\n - 1\n")
    monkeypatch.chdir(tmp_path)
    main(["--dataset", "ball", "--config", "tcfg",
          "--config_dir", str(tmp_path / "configs"), "--folder", root,
          "--naive", "True", "--pred_frames", "2", "--max_clips", "4",
          "--batch_clips", "2", "--timing"])
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    t = json.loads(lines[-1])
    assert t["clips"] == 4 and t["batches"] == 2
    assert t["first_sync_s"] is not None
    assert 0 < t["first_sync_s"] <= t["total_s"]


def test_naive_diff_is_pure_copy(tmp_path, monkeypatch):
    """--naive + --train_mode diff must score the reference's pure
    copy-last-frame control (prediction/predict_naive_fvd.py), NOT
    Identity wrapped in the diff residual add (which doubles the latent
    and accidentally strengthens the baseline under random-I3D FVD —
    caught live in the r5 quality_modes run: naive-diff FVD 2.8 vs the
    true control's 10.2)."""
    import os

    import cv2

    from sd_video_gen_tpu.data.synthetic import generate_bouncing_ball_tree
    from sd_video_gen_tpu.predict.predict import main

    root = generate_bouncing_ball_tree(str(tmp_path / "ball"), 2, 1, 10, 32)
    (tmp_path / "configs").mkdir()
    (tmp_path / "configs" / "ndcfg.yml").write_text(
        "BATCH_SIZE:\n - 2\nFRAMES_PER_CLIP:\n - 5\nFRAMES_TO_PREDICT:\n"
        " - 2\nFRAME_SIZE: 32\nDIM_MODEL:\n - 32\nNUM_HEADS:\n - 4\n"
        "NUM_ENCODER_LAYERS:\n - 1\nNUM_DECODER_LAYERS:\n - 1\n")
    monkeypatch.chdir(tmp_path)
    for mode in ("ar", "diff"):
        main(["--dataset", "ball", "--config", "ndcfg",
              "--config_dir", str(tmp_path / "configs"), "--folder", root,
              "--naive", "True", "--train_mode", mode, "--pred_frames", "2",
              "--max_clips", "1", "--save_output", "True"])
    out = sorted(os.listdir(tmp_path / "outputs"), key=int)
    assert len(out) == 2
    a, b = (tmp_path / "outputs" / d for d in out)
    for f in sorted(os.listdir(a)):
        ia = cv2.imread(str(a / f))
        ib = cv2.imread(str(b / f))
        assert ia is not None and (ia == ib).all(), f
