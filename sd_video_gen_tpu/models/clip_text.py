"""CLIP ViT-L/14 text encoder in JAX/Flax (conditioning for the SD UNet).

The reference loads transformers' CLIPTextModel (utils/sd_utils.py:59-61) to
embed prompts (encode_text, 78-95). TPU-native implementation: pre-LN
transformer with quick-GELU MLPs and a causal mask, batch-first, one jitted
forward. Weight conversion: diffusion/weights.convert_clip_text.

For the video --denoise path the reference only ever encodes the empty
prompt with guidance_scale=0 (prediction/predict.py:148,169), so
``empty_prompt_ids`` provides the constant uncond token sequence
(BOS + EOS padding — SD's CLIP tokenizer pads with EOS) without needing
tokenizer data files. Full prompt tokenization uses a local tokenizer dir
when provided (diffusion/sd.py).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BOS_TOKEN = 49406
EOS_TOKEN = 49407


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_length: int = 77
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


def empty_prompt_ids(batch: int = 1, max_length: int = 77) -> jnp.ndarray:
    """Token ids of '' under the SD CLIP tokenizer: [BOS, EOS, EOS, ...]."""
    ids = np.full((batch, max_length), EOS_TOKEN, np.int32)
    ids[:, 0] = BOS_TOKEN
    return jnp.asarray(ids)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        H, hd = c.num_heads, c.hidden_size // c.num_heads
        dense = lambda name: nn.Dense(c.hidden_size, dtype=c.dtype,
                                      param_dtype=c.param_dtype, name=name)
        B, T, _ = x.shape
        q = dense("q_proj")(x).reshape(B, T, H, hd)
        k = dense("k_proj")(x).reshape(B, T, H, hd)
        v = dense("v_proj")(x).reshape(B, T, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                       preferred_element_type=jnp.float32).astype(c.dtype)
        return dense("out_proj")(o.reshape(B, T, c.hidden_size))


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                                       param_dtype=c.param_dtype, name=name)
        x = x + CLIPAttention(c, name="self_attn")(ln("layer_norm1")(x), mask)
        h = ln("layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype,
                     param_dtype=c.param_dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, param_dtype=c.param_dtype,
                     name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """(B, 77) int32 token ids -> (B, 77, hidden) last hidden state."""

    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, input_ids):
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                       param_dtype=c.param_dtype, name="token_embedding")
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (c.max_length, c.hidden_size), c.param_dtype)
        T = input_ids.shape[1]
        x = tok(input_ids) + pos[None, :T].astype(c.dtype)
        mask = jnp.triu(jnp.full((T, T), -jnp.inf, jnp.float32), k=1)
        for i in range(c.num_layers):
            x = CLIPLayer(c, name=f"layer_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         param_dtype=c.param_dtype, name="final_layer_norm")(x)
        return x.astype(jnp.float32)
