"""CLIP text encoder parity vs the real transformers CLIPTextModel (random
init from config — no pretrained download), via convert_clip_text."""

import numpy as np
import torch
import jax.numpy as jnp

from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

from sd_video_gen_tpu.models.clip_text import (CLIPTextEncoder, CLIPTextConfig,
                                               empty_prompt_ids, BOS_TOKEN,
                                               EOS_TOKEN)
from sd_video_gen_tpu.diffusion.weights import convert_clip_text


def test_clip_parity_vs_transformers():
    hf_cfg = HFConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=16, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_text(sd, num_layers=2)

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64, max_length=16)
    enc = CLIPTextEncoder(cfg)

    ids = np.array([[1, 5, 7, 9, 2, 0, 0, 0]], np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).last_hidden_state.numpy()
    ours = np.asarray(enc.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_empty_prompt_ids():
    ids = np.asarray(empty_prompt_ids(batch=2))
    assert ids.shape == (2, 77)
    assert ids[0, 0] == BOS_TOKEN
    assert (ids[:, 1:] == EOS_TOKEN).all()
