"""HF-checkpoint -> JAX parameter conversion (VAE; UNet/CLIP join here later).

The reference pulls weights at runtime from the HuggingFace hub via diffusers
(utils/sd_utils.py:52-66). This module converts an on-disk checkpoint
(safetensors or torch .bin state_dict) into the param pytrees of our Flax
modules, handling the layout differences:

  torch Conv2d  (O, I, kh, kw)  ->  flax Conv  (kh, kw, I, O)
  torch Linear  (O, I)          ->  flax Dense (I, O)
  torch GroupNorm weight/bias   ->  flax GroupNorm scale/bias
  1x1-conv attention projections (CompVis-era) are squeezed to Linear.

No network access is required or attempted: pass a local file.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_state_dict(path: str) -> dict:
    """Load a checkpoint file -> {name: np.ndarray} (f32)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = np.asarray(f.get_tensor(k), dtype=np.float32)
        return out
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def _conv_w(w: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _linear_w(w: np.ndarray) -> jnp.ndarray:
    if w.ndim == 4:  # 1x1 conv used as linear
        w = w[:, :, 0, 0]
    return jnp.asarray(w.T)


def _conv(sd, prefix):
    return {"kernel": _conv_w(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


def _dense(sd, prefix):
    return {"kernel": _linear_w(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


def _norm(sd, prefix):
    return {"scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


def _resnet(sd, prefix, has_shortcut):
    out = {"norm1": _norm(sd, prefix + ".norm1"),
           "conv1": _conv(sd, prefix + ".conv1"),
           "norm2": _norm(sd, prefix + ".norm2"),
           "conv2": _conv(sd, prefix + ".conv2")}
    if has_shortcut:
        out["conv_shortcut"] = _conv(sd, prefix + ".conv_shortcut")
    return out


def _attn(sd, prefix):
    # naming drift across diffusers versions: query/key/value/proj_attn
    # (old) vs to_q/to_k/to_v/to_out.0 (new)
    def pick(*names):
        for n in names:
            if prefix + "." + n + ".weight" in sd:
                return prefix + "." + n
        raise KeyError(f"none of {names} under {prefix}")
    return {"group_norm": _norm(sd, pick("group_norm", "norm")),
            "query": _dense(sd, pick("query", "to_q", "q")),
            "key": _dense(sd, pick("key", "to_k", "k")),
            "value": _dense(sd, pick("value", "to_v", "v")),
            "proj_attn": _dense(sd, pick("proj_attn", "to_out.0", "proj_out"))}


def convert_vae(sd: dict, block_out=(128, 256, 512, 512),
                layers_per_block: int = 2) -> dict:
    """diffusers AutoencoderKL state_dict -> params for models/vae.AutoencoderKL."""
    n = len(block_out)
    enc: dict = {"conv_in": _conv(sd, "encoder.conv_in"),
                 "norm_out": _norm(sd, "encoder.conv_norm_out"),
                 "conv_out": _conv(sd, "encoder.conv_out")}
    in_ch = block_out[0]
    for i in range(n):
        out_ch = block_out[i]
        for j in range(layers_per_block):
            p = f"encoder.down_blocks.{i}.resnets.{j}"
            enc[f"down_{i}_res_{j}"] = _resnet(
                sd, p, has_shortcut=(p + ".conv_shortcut.weight") in sd)
        if i < n - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}
        in_ch = out_ch
    enc["mid"] = {
        "resnet_0": _resnet(sd, "encoder.mid_block.resnets.0", False),
        "attn": _attn(sd, "encoder.mid_block.attentions.0"),
        "resnet_1": _resnet(sd, "encoder.mid_block.resnets.1", False),
    }

    dec: dict = {"conv_in": _conv(sd, "decoder.conv_in"),
                 "norm_out": _norm(sd, "decoder.conv_norm_out"),
                 "conv_out": _conv(sd, "decoder.conv_out")}
    for i in range(n):
        for j in range(layers_per_block + 1):
            p = f"decoder.up_blocks.{i}.resnets.{j}"
            dec[f"up_{i}_res_{j}"] = _resnet(
                sd, p, has_shortcut=(p + ".conv_shortcut.weight") in sd)
        if i < n - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")}
    dec["mid"] = {
        "resnet_0": _resnet(sd, "decoder.mid_block.resnets.0", False),
        "attn": _attn(sd, "decoder.mid_block.attentions.0"),
        "resnet_1": _resnet(sd, "decoder.mid_block.resnets.1", False),
    }

    return {"params": {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }}
