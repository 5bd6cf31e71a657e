"""Persistent serving mode (predict --serve): framing, padding, and the
end-to-end CLI path. Counterpart of the reference's interactive per-clip
loop (prediction/predict.py:231-247) re-designed as a warm socket server
so the measured 200-270s per-process cold start is paid once per host."""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from sd_video_gen_tpu.predict import serve as S


def _start(target, *a, **kw):
    t = threading.Thread(target=target, args=a, kwargs=kw, daemon=True)
    t.start()
    return t


def test_serve_framing_padding_and_errors(tmp_path):
    """Unit level: stub predict/decode, exercise every op + ragged batches."""
    B, T, H, P = 4, 5, 8, 3  # batch, context frames, frame px, pred frames
    calls = []

    def predict(params, frames, text_embeds=None):
        calls.append(frames.shape)
        assert frames.shape == (B, T, H, H, 3)  # padded, never ragged
        lat = jnp.mean(frames.astype(jnp.float32), axis=(2, 3, 4),
                       keepdims=False)[..., None] * jnp.ones((1, 1, 16))
        return lat, lat[:, :P] + 1.0  # context (B,T,16), preds (B,P,16)

    def decode(flat):
        n = flat.shape[0]
        return jnp.broadcast_to(flat[:, :1, None, None],
                                (n, H, H, 3)).astype(jnp.uint8)

    sock = str(tmp_path / "s.sock")
    th = _start(S.serve, sock, predict, decode, None, batch_clips=B,
                frames_per_clip=T, frame_size=H)
    S.wait_ready(sock, deadline_s=30)

    assert S.ping(sock)["ok"] is True

    # full batch
    frames = np.random.default_rng(0).integers(
        0, 255, (B, T, H, H, 3)).astype(np.uint8)
    imgs, is_pred, hdr = S.request(sock, frames)
    assert imgs.shape == (B, T - 1 + P, H, H, 3)
    assert is_pred == [False] * (T - 1) + [True] * P
    assert hdr["latency_s"] >= 0

    # ragged batch: padded on the wire, sliced on reply — same program
    imgs2, _, _ = S.request(sock, frames[:2])
    assert imgs2.shape == (2, T - 1 + P, H, H, 3)
    np.testing.assert_array_equal(imgs2, imgs[:2])
    assert all(s == (B, T, H, H, 3) for s in calls)  # zero recompiles

    # oversize batch is an error REPLY, not a server death
    big = np.zeros((B + 1, T, H, H, 3), np.uint8)
    with pytest.raises(RuntimeError, match="exceeds the compiled"):
        S.request(sock, big)
    assert S.ping(sock)["ok"] is True  # still alive

    # client-side shape validation
    with pytest.raises(ValueError, match="frames must be"):
        S.request(sock, np.zeros((T, H, H, 3), np.uint8))

    assert S.shutdown(sock)["ok"] is True
    th.join(timeout=30)
    assert not th.is_alive()


def test_serve_text_labels_reach_embedder(tmp_path):
    seen = []

    def embedder(ids):
        seen.append(np.asarray(ids))
        return jnp.zeros((ids.shape[0], 4))

    def predict(params, frames, text_embeds=None):
        assert text_embeds is not None and text_embeds.shape == (2, 4)
        lat = jnp.zeros((2, 3, 8))
        return lat, lat[:, :1]

    def decode(flat):
        return jnp.zeros((flat.shape[0], 4, 4, 3), jnp.uint8)

    sock = str(tmp_path / "t.sock")
    th = _start(S.serve, sock, predict, decode, None, batch_clips=2,
                frames_per_clip=3, frame_size=4, embedder=embedder)
    S.wait_ready(sock, deadline_s=30)
    frames = np.zeros((1, 3, 4, 4, 3), np.uint8)
    imgs, _, _ = S.request(sock, frames, labels=[7])
    assert imgs.shape == (1, 3, 4, 4, 3)
    # ragged label list padded alongside the frames: [7] -> [7, 7]
    np.testing.assert_array_equal(seen[-1], [7, 7])
    S.shutdown(sock)
    th.join(timeout=30)


def test_predict_cli_serve_end_to_end(tmp_path):
    """The verbatim CLI with --serve: warm once, answer batches, shut down.

    Uses --naive (Identity) so no checkpoint is needed; the serve branch
    shares predict/decode with the dataset path, so the model machinery is
    covered by the existing CLI tests."""
    from sd_video_gen_tpu.predict.predict import main

    (tmp_path / "configs").mkdir()
    (tmp_path / "configs" / "servecfg.yml").write_text(
        "BATCH_SIZE:\n - 2\nFRAMES_PER_CLIP:\n - 5\nFRAMES_TO_PREDICT:\n"
        " - 2\nFRAME_SIZE: 32\nDIM_MODEL:\n - 32\nNUM_HEADS:\n - 4\n"
        "NUM_ENCODER_LAYERS:\n - 1\nNUM_DECODER_LAYERS:\n - 1\n")
    sock = str(tmp_path / "cli.sock")
    th = _start(main, ["--dataset", "ball", "--config", "servecfg",
                       "--config_dir", str(tmp_path / "configs"),
                       "--naive", "True", "--pred_frames", "2",
                       "--batch_clips", "2", "--serve", sock])
    S.wait_ready(sock, deadline_s=120)

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 5, 32, 32, 3)).astype(np.uint8)
    imgs, is_pred, _ = S.request(sock, frames)
    assert imgs.shape == (2, 4 + 2, 32, 32, 3)
    assert is_pred == [False] * 4 + [True] * 2
    # Identity baseline: both predicted latents ARE the last context latent,
    # so the two predicted frames decode identically (the pixel codec's 8x
    # down/up-sample is lossy, so comparing against the raw input would be
    # wrong — compare within the decoded sequence instead)
    np.testing.assert_array_equal(imgs[:, 4], imgs[:, 5])
    assert imgs[:, 4].std() > 0  # not a degenerate all-zero decode

    # a second, RAGGED request is served by the same warm program and
    # reproduces the full batch's rows exactly
    imgs2, _, hdr2 = S.request(sock, frames[:1])
    assert imgs2.shape == (1, 6, 32, 32, 3)
    np.testing.assert_array_equal(imgs2, imgs[:1])
    assert S.shutdown(sock)["ok"] is True
    th.join(timeout=60)
    assert not th.is_alive()
