"""The frame-latent seq2seq transformer family, TPU-first.

One model with mode flags replaces the reference's four near-clone classes:
  - mode='ar'          : models/transformer.py:9-94 (teacher-forced next-frame AR)
  - mode='future'      : models/transformer_future.py (k-step single-shot; adds a
                         ``learned_tgt`` parameter of shape (1, K, latent_dim))
  - mode='learned_tgt' : models/transformer_learned_tgt.py:38-63 (DETR-style
                         learnable queries; decoder input = LN(zeros)+query_pos)
  - mode='text'        : models/transformer_text.py:33-92 (class-name text
                         embedding concatenated per-token; the reference ran a
                         SentenceTransformer on host *inside forward* — here text
                         embeddings come from an on-device table, zero host syncs)
  - 'diff' (residual prediction) is a *training-loop* strategy, not a model
    change (trainers/trainer_diff.py:140-142), so it lives in the trainer.

Architecture semantics match torch ``nn.Transformer`` defaults (post-LN, ReLU,
dim_feedforward=2048, LayerNorm eps=1e-5, attention-weight dropout), but the
implementation is batch-first JAX: fused QKV projections for the MXU, einsum
attention (sequences are <=16 frame tokens — far below the flash-attention
crossover), bf16 compute with f32 params/reductions, and static shapes
throughout so the whole forward jits into one XLA program.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from sd_video_gen_tpu.models.positional import sinusoidal_positions


@dataclasses.dataclass(frozen=True)
class FrameTransformerConfig:
    latent_dim: int              # 4 * (frame_size/8)^2 flattened SD latent
    dim_model: int = 2048
    num_heads: int = 8
    num_encoder_layers: int = 4
    num_decoder_layers: int = 8
    dropout_p: float = 0.1
    dim_feedforward: int = 2048  # torch nn.Transformer default
    max_len: int = 64            # positional table window (reference: max_len=64)
    mode: str = "ar"             # ar | future | learned_tgt | text
    frames_to_predict: int = 5   # used by future/learned_tgt modes
    text_embed_dim: int = 384    # MiniLM-L6-v2 embedding width (text mode)
    pe_mode: str = "timestep"    # 'timestep' (correct) | 'reference_batch'
    #   'reference_batch' reproduces the reference's PositionalEncoding bug
    #   (models/transformer.py:55-61: the seq-first PE buffer indexed by the
    #   BATCH axis adds PE(b) to every timestep of item b) so converted
    #   reference checkpoints serve the exact forward they were trained
    #   under. CLI: --reference_pe.
    dtype: jnp.dtype = jnp.float32          # compute dtype (bf16 on TPU)
    param_dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        if self.model_width % self.num_heads != 0:
            raise ValueError(
                f"model width {self.model_width} (dim_model"
                f"{'+text_embed_dim' if self.mode == 'text' else ''}) must be "
                f"divisible by num_heads={self.num_heads}")

    @property
    def model_width(self) -> int:
        """Actual transformer width: text mode concatenates the text embedding
        (models/transformer_text.py:34: dim_model + 384)."""
        if self.mode == "text":
            return self.dim_model + self.text_embed_dim
        return self.dim_model

    @classmethod
    def from_config(cls, cfg, mode: str = "ar", **kw) -> "FrameTransformerConfig":
        return cls(
            latent_dim=cfg.latent_dim,
            dim_model=cfg.dim_model,
            num_heads=cfg.num_heads,
            num_encoder_layers=cfg.num_encoder_layers,
            num_decoder_layers=cfg.num_decoder_layers,
            dropout_p=cfg.dropout_p,
            mode=mode,
            frames_to_predict=cfg.frames_to_predict,
            **kw,
        )


class MultiHeadAttention(nn.Module):
    """MHA with fused QKV for self-attention; additive mask; attn-weight dropout."""

    cfg: FrameTransformerConfig

    @nn.compact
    def __call__(self, q_in, kv_in, mask: Optional[jnp.ndarray], deterministic: bool):
        c = self.cfg
        D = c.model_width
        H = c.num_heads
        hd = D // H
        self_attn = q_in is kv_in

        dense = lambda feats, name: nn.Dense(
            feats, dtype=c.dtype, param_dtype=c.param_dtype, name=name)

        if self_attn:
            qkv = dense(3 * D, "qkv")(q_in)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense(D, "q")(q_in)
            k = dense(D, "k")(kv_in)
            v = dense(D, "v")(kv_in)

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, H, hd)
        k = k.reshape(B, Tk, H, hd)
        v = v.reshape(B, Tk, H, hd)

        # f32 logits for softmax stability regardless of compute dtype.
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(hd)
        if mask is not None:
            logits = logits + mask.astype(jnp.float32)
        weights = nn.softmax(logits, axis=-1)
        weights = nn.Dropout(c.dropout_p)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(c.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, Tq, D).astype(c.dtype)
        return dense(D, "out")(out)


class _FFN(nn.Module):
    cfg: FrameTransformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool):
        c = self.cfg
        h = nn.Dense(c.dim_feedforward, dtype=c.dtype, param_dtype=c.param_dtype,
                     name="lin1")(x)
        h = nn.relu(h)
        h = nn.Dropout(c.dropout_p)(h, deterministic=deterministic)
        h = nn.Dense(c.model_width, dtype=c.dtype, param_dtype=c.param_dtype,
                     name="lin2")(h)
        return h


def _ln(name):
    return nn.LayerNorm(epsilon=1e-5, name=name)  # torch LayerNorm default eps


class EncoderLayer(nn.Module):
    cfg: FrameTransformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool):
        c = self.cfg
        drop = nn.Dropout(c.dropout_p)
        a = MultiHeadAttention(c, name="self_attn")(x, x, None, deterministic)
        x = _ln("norm1")(x + drop(a, deterministic=deterministic))
        f = _FFN(c, name="ffn")(x, deterministic)
        x = _ln("norm2")(x + drop(f, deterministic=deterministic))
        return x


class DecoderLayer(nn.Module):
    cfg: FrameTransformerConfig

    @nn.compact
    def __call__(self, x, memory, tgt_mask, deterministic: bool):
        c = self.cfg
        drop = nn.Dropout(c.dropout_p)
        a = MultiHeadAttention(c, name="self_attn")(x, x, tgt_mask, deterministic)
        x = _ln("norm1")(x + drop(a, deterministic=deterministic))
        ca = MultiHeadAttention(c, name="cross_attn")(x, memory, None, deterministic)
        x = _ln("norm2")(x + drop(ca, deterministic=deterministic))
        f = _FFN(c, name="ffn")(x, deterministic)
        x = _ln("norm3")(x + drop(f, deterministic=deterministic))
        return x


class FrameTransformer(nn.Module):
    """Seq2seq encoder-decoder over flattened frame latents.

    Call: ``model.apply(params, src, tgt, tgt_mask=mask, text_embeds=emb,
    deterministic=..., rngs={'dropout': key})`` -> (B, T_tgt, latent_dim).
    Text conditioning takes pre-computed embeddings (text_embeds) — the
    on-device id->embedding lookup lives in models/text_embed.py and runs
    in the caller (trainer/predict), keeping this module table-free.
    All tensors are batch-first (the reference permuted to seq-first purely for
    an old torch API — models/transformer.py:58-61).
    """

    cfg: FrameTransformerConfig

    @nn.compact
    def __call__(self, src, tgt, tgt_mask=None,
                 text_embeds=None, deterministic: bool = True):
        c = self.cfg
        D = c.model_width
        scale = math.sqrt(D)
        drop = nn.Dropout(c.dropout_p)
        pos_table = sinusoidal_positions(c.max_len, D)

        if c.mode == "future":
            # Parameter exists for parity with models/transformer_future.py:46-47;
            # the reference trainer feeds y_input as tgt, so it participates in
            # checkpoints but not this forward (same as reference behavior).
            self.param("learned_tgt", nn.initializers.normal(1.0),
                       (1, c.frames_to_predict, c.latent_dim), c.param_dtype)

        if c.mode == "learned_tgt":
            # DETR-style decoder input built in latent space then embedded
            # (models/transformer_learned_tgt.py:38-41,60-63).
            query_pos = self.param("query_pos", nn.initializers.uniform(1.0),
                                   (c.frames_to_predict, c.latent_dim),
                                   c.param_dtype)
            zeros = jnp.zeros_like(query_pos)
            q = _ln("tgt_norm")(zeros) + query_pos
            tgt = jnp.broadcast_to(q[None], (src.shape[0],) + q.shape)

        if c.mode == "text":
            # Per-token concat of the class-name embedding
            # (models/transformer_text.py:82-92), fully on device.
            if text_embeds is None:
                raise ValueError("text mode requires text_embeds (B, text_embed_dim)")
            proj = nn.Dense(c.dim_model, dtype=c.dtype, param_dtype=c.param_dtype,
                            name="project_image_embedding")
            t = text_embeds.astype(c.dtype)
            src = jnp.concatenate(
                [proj(src.astype(c.dtype)),
                 jnp.broadcast_to(t[:, None], (t.shape[0], src.shape[1], t.shape[-1]))],
                axis=-1) * scale
            tgt = jnp.concatenate(
                [proj(tgt.astype(c.dtype)),
                 jnp.broadcast_to(t[:, None], (t.shape[0], tgt.shape[1], t.shape[-1]))],
                axis=-1) * scale
        else:
            embed = nn.Dense(D, dtype=c.dtype, param_dtype=c.param_dtype,
                             name="embedding")
            src = embed(src.astype(c.dtype)) * scale
            tgt = embed(tgt.astype(c.dtype)) * scale

        if c.pe_mode == "reference_batch":
            # reference bug reproduction: PE(batch_index) added to every
            # timestep of that item (constant over time) — see config note.
            pe_src = pos_table[: src.shape[0]][:, None, :]
            pe_tgt = pos_table[: tgt.shape[0]][:, None, :]
        else:
            pe_src = pos_table[None, : src.shape[1]]
            pe_tgt = pos_table[None, : tgt.shape[1]]
        src = drop(src + pe_src.astype(c.dtype), deterministic=deterministic)
        tgt = drop(tgt + pe_tgt.astype(c.dtype), deterministic=deterministic)

        # torch nn.Transformer applies a FINAL LayerNorm after each stack
        # (encoder.norm / decoder.norm) — required for checkpoint parity.
        memory = src
        for i in range(c.num_encoder_layers):
            memory = EncoderLayer(c, name=f"enc_{i}")(memory, deterministic)
        memory = _ln("enc_norm")(memory)
        x = tgt
        for i in range(c.num_decoder_layers):
            x = DecoderLayer(c, name=f"dec_{i}")(x, memory, tgt_mask, deterministic)
        x = _ln("dec_norm")(x)

        out = nn.Dense(c.latent_dim, dtype=c.dtype, param_dtype=c.param_dtype,
                       name="out")(x)
        return out.astype(jnp.float32)
