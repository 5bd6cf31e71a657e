"""Reference-checkpoint conversion: full-forward parity vs REAL torch.

The strongest transformer oracle in the suite: the torch side is an actual
``nn.Transformer`` (the exact module the reference builds —
models/transformer.py:38-45), not a hand-built replica, so post-LN layout,
fused in_proj, ReLU FFN, LayerNorm eps, softmax dropout placement AND the
stacks' final norms are all torch's own. Positional encoding is applied per
timestep on both sides (the reference's per-BATCH-index application is a
documented deviation — see PARITY.md).
"""

import dataclasses
import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from sd_video_gen_tpu.diffusion.weights import (convert_exhaustive,
                                                convert_frame_transformer,
                                                assert_matches_model)
from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
from sd_video_gen_tpu.models.positional import sinusoidal_positions
from sd_video_gen_tpu.ops.masks import causal_mask

L, D, H, NE, ND, FF = 16, 32, 4, 2, 2, 64


class _TorchRef(nn.Module):
    """The reference Transformer (models/transformer.py:9-67) with the
    per-timestep positional fix and dropout 0 (eval parity)."""

    def __init__(self, latent=L, dim=D, mode="ar", k=3, ne=NE, nd=ND, ff=FF,
                 pe="timestep"):
        super().__init__()
        self.dim = dim
        self.mode = mode
        self.pe = pe
        width = dim + 384 if mode == "text" else dim
        self.width = width
        if mode == "text":
            self.project_image_embedding = nn.Linear(latent, dim)
        else:
            self.embedding = nn.Linear(latent, width)
        self.transformer = nn.Transformer(
            d_model=width, nhead=H, num_encoder_layers=ne,
            num_decoder_layers=nd, dim_feedforward=ff, dropout=0.0)
        self.out = nn.Linear(width, latent)
        if mode == "future":
            self.learned_tgt = nn.Parameter(torch.randn(1, k, latent))
        if mode == "learned_tgt":
            self.query_pos = nn.Parameter(torch.rand(k, latent))
            self.norm = nn.LayerNorm(latent)
        pos = np.asarray(sinusoidal_positions(64, width))
        self.register_buffer("positional_encoder_pos", torch.tensor(pos))

    def forward(self, src, tgt, tgt_mask=None, text=None):
        if self.mode == "learned_tgt":
            N = src.shape[0]
            q = self.norm(torch.zeros_like(self.query_pos)) + self.query_pos
            tgt = q.unsqueeze(0).repeat(N, 1, 1)
        if self.mode == "text":
            s = self.project_image_embedding(src)
            t = self.project_image_embedding(tgt)
            txt_s = text.unsqueeze(1).repeat(1, s.shape[1], 1)
            txt_t = text.unsqueeze(1).repeat(1, t.shape[1], 1)
            src = torch.cat((s, txt_s), -1) * math.sqrt(self.width)
            tgt = torch.cat((t, txt_t), -1) * math.sqrt(self.width)
        else:
            src = self.embedding(src) * math.sqrt(self.width)
            tgt = self.embedding(tgt) * math.sqrt(self.width)
        if self.pe == "reference_batch":
            # the reference's actual behavior: the seq-first PE buffer
            # indexed by the BATCH axis (models/transformer.py:55-61 fed
            # batch-first tensors) — PE(b) added to every timestep of item b
            src = src + self.positional_encoder_pos[: src.shape[0]].unsqueeze(1)
            tgt = tgt + self.positional_encoder_pos[: tgt.shape[0]].unsqueeze(1)
        else:
            src = src + self.positional_encoder_pos[: src.shape[1]]
            tgt = tgt + self.positional_encoder_pos[: tgt.shape[1]]
        y = self.transformer(src.permute(1, 0, 2), tgt.permute(1, 0, 2),
                             tgt_mask=tgt_mask)
        return self.out(y).permute(1, 0, 2)


def _state_dict(tm):
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
          if k != "positional_encoder_pos"}
    # reference checkpoints carry the PE buffer under this name
    sd["positional_encoder.pos_encoding"] = (
        tm.positional_encoder_pos.numpy()[:, None, :])
    return sd


def _cfg(mode="ar", k=3):
    return FrameTransformerConfig(latent_dim=L, dim_model=D, num_heads=H,
                                  num_encoder_layers=NE, num_decoder_layers=ND,
                                  dim_feedforward=FF, dropout_p=0.0,
                                  mode=mode, frames_to_predict=k)


@torch.no_grad()
def test_ar_full_forward_parity(rng):
    tm = _TorchRef().eval()
    params = convert_exhaustive("transformer", _state_dict(tm))
    model = FrameTransformer(_cfg())
    src = rng.standard_normal((2, 5, L)).astype(np.float32)
    tgt = rng.standard_normal((2, 4, L)).astype(np.float32)

    ours = model.apply(params, jnp.asarray(src), jnp.asarray(tgt),
                       tgt_mask=causal_mask(4))
    mask = torch.from_numpy(np.asarray(causal_mask(4)))
    ref = tm(torch.from_numpy(src), torch.from_numpy(tgt), tgt_mask=mask)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-4)


@torch.no_grad()
def test_conversion_bidirectional_exhaustive(rng):
    """Every checkpoint key consumed; every model param filled (all modes)."""
    for mode in ("ar", "future", "learned_tgt", "text"):
        tm = _TorchRef(mode=mode).eval()
        params = convert_exhaustive("transformer", _state_dict(tm), mode=mode)
        model = FrameTransformer(_cfg(mode=mode))
        src = jnp.zeros((1, 4, L))
        kw = {}
        if mode == "text":
            kw["text_embeds"] = jnp.zeros((1, 384))
        abstract = jax.eval_shape(
            lambda s: model.init(jax.random.PRNGKey(0), s, s, **kw), src)
        assert_matches_model(params, abstract)


@torch.no_grad()
def test_future_mode_parity(rng):
    tm = _TorchRef(mode="future").eval()
    params = convert_frame_transformer(_state_dict(tm), mode="future")
    model = FrameTransformer(_cfg(mode="future"))
    src = rng.standard_normal((2, 4, L)).astype(np.float32)
    ours = model.apply({"params": params["params"]}, jnp.asarray(src),
                       jnp.asarray(src))
    ref = tm(torch.from_numpy(src), torch.from_numpy(src))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-4)


@torch.no_grad()
def test_learned_tgt_mode_parity(rng):
    tm = _TorchRef(mode="learned_tgt").eval()
    params = convert_frame_transformer(_state_dict(tm), mode="learned_tgt")
    model = FrameTransformer(_cfg(mode="learned_tgt"))
    src = rng.standard_normal((2, 4, L)).astype(np.float32)
    ours = model.apply(params, jnp.asarray(src), None)
    ref = tm(torch.from_numpy(src), None)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-4)


@torch.no_grad()
def test_text_mode_parity(rng):
    tm = _TorchRef(mode="text").eval()
    params = convert_frame_transformer(_state_dict(tm), mode="text")
    model = FrameTransformer(_cfg(mode="text"))
    src = rng.standard_normal((2, 4, L)).astype(np.float32)
    tgt = rng.standard_normal((2, 3, L)).astype(np.float32)
    emb = rng.standard_normal((2, 384)).astype(np.float32)
    ours = model.apply(params, jnp.asarray(src), jnp.asarray(tgt),
                       tgt_mask=causal_mask(3), text_embeds=jnp.asarray(emb))
    mask = torch.from_numpy(np.asarray(causal_mask(3)))
    ref = tm(torch.from_numpy(src), torch.from_numpy(tgt), tgt_mask=mask,
             text=torch.from_numpy(emb))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-4)


@torch.no_grad()
def test_reference_pe_compat_full_forward_parity(rng):
    """pe_mode='reference_batch' (--reference_pe) reproduces the reference's
    ACTUAL forward — per-batch-index positional encoding — so converted
    checkpoints serve the signal they were trained with."""
    tm = _TorchRef(pe="reference_batch").eval()
    params = convert_exhaustive("transformer", _state_dict(tm))
    model = FrameTransformer(
        dataclasses.replace(_cfg(), pe_mode="reference_batch"))
    src = rng.standard_normal((3, 5, L)).astype(np.float32)
    tgt = rng.standard_normal((3, 4, L)).astype(np.float32)
    ours = model.apply(params, jnp.asarray(src), jnp.asarray(tgt),
                       tgt_mask=causal_mask(4))
    mask = torch.from_numpy(np.asarray(causal_mask(4)))
    ref = tm(torch.from_numpy(src), torch.from_numpy(tgt), tgt_mask=mask)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_text_mode_skips_sent_transformer_keys(rng):
    """Real reference text checkpoints register the frozen SentenceTransformer
    as a submodule (models/transformer_text.py), so their state_dicts carry
    sent_transformer.* keys. convert_exhaustive must consume (drop) them in
    text mode — and stay strict about them everywhere else."""
    tm = _TorchRef(mode="text").eval()
    sd = _state_dict(tm)
    sd.update({
        "sent_transformer.0.auto_model.embeddings.word_embeddings.weight":
            rng.standard_normal((100, 16)).astype(np.float32),
        "sent_transformer.0.auto_model.encoder.layer.0.attention.self"
        ".query.weight": rng.standard_normal((16, 16)).astype(np.float32),
        "sent_transformer.1.linear.bias":
            rng.standard_normal((16,)).astype(np.float32),
    })
    params = convert_exhaustive("transformer", sd, mode="text")
    model = FrameTransformer(_cfg(mode="text"))
    abstract = jax.eval_shape(
        lambda s: model.init(jax.random.PRNGKey(0), s, s,
                             text_embeds=jnp.zeros((1, 384))),
        jnp.zeros((1, 4, L)))
    assert_matches_model(params, abstract)

    # non-text modes stay strict: unexpected keys still raise
    tm_ar = _TorchRef().eval()
    sd_ar = _state_dict(tm_ar)
    sd_ar["sent_transformer.1.linear.bias"] = np.zeros(4, np.float32)
    with pytest.raises(ValueError, match="never.*consumed|consumed"):
        convert_exhaustive("transformer", sd_ar)


def test_predict_cli_autodetects_reference_pt(rng, tmp_path):
    """A reference-named .pt dropped into --checkpoint_dir is converted."""
    from types import SimpleNamespace

    tm = _TorchRef().eval()
    torch.save(tm.state_dict(), tmp_path / "ballcfg_0_test.pt")
    # the real reference checkpoint also carries the PE buffer
    sd_file = torch.load(tmp_path / "ballcfg_0_test.pt", weights_only=True)
    assert "positional_encoder_pos" in sd_file  # buffer present like reference

    from sd_video_gen_tpu.predict.predict import load_model_params
    model = FrameTransformer(_cfg())
    args = SimpleNamespace(checkpoint_dir=str(tmp_path), config="ballcfg",
                           index=0, mode="", torch_checkpoint=None)
    params = load_model_params(None, args, model, None, "test")
    direct = convert_frame_transformer(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(direct)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_resume_from_reference_pt(tmp_path):
    """--resume --old_name <run> with a torch .pt (trainers/trainer.py:363)."""
    from sd_video_gen_tpu.config import Config
    from sd_video_gen_tpu.train.trainer import Trainer
    from sd_video_gen_tpu.parallel import make_mesh

    cfg = Config(config_name="tiny", lr=1e-3, batch_size=2, frames_per_clip=5,
                 frames_to_predict=2, frame_size=32, dim_model=32, num_heads=4,
                 num_encoder_layers=1, num_decoder_layers=1, dropout_p=0.0,
                 use_mse=True, use_gdl=False, use_contrastive=False)
    tm = _TorchRef(latent=64, dim=32, ne=1, nd=1, ff=2048).eval()
    ckdir = tmp_path / "ckpt"
    ckdir.mkdir()
    torch.save(tm.state_dict(), ckdir / "oldrun.pt")

    mesh = make_mesh("data=1,model=1", devices=jax.devices()[:1])
    t = Trainer(cfg, mode="ar", codec_kind="pixel", mesh=mesh,
                checkpoint_dir=str(ckdir), use_wandb=False)
    frames = np.zeros((2, 7, 32, 32, 3), np.uint8)
    t.init_state(frames)
    t.resume("oldrun")
    emb = np.asarray(t.state.params["params"]["embedding"]["kernel"])
    np.testing.assert_allclose(emb, tm.embedding.weight.detach().numpy().T,
                               rtol=1e-6)
    dn = np.asarray(t.state.params["params"]["dec_norm"]["scale"])
    np.testing.assert_allclose(
        dn, tm.transformer.decoder.norm.weight.detach().numpy(), rtol=1e-6)
