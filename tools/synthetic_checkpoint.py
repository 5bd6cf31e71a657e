"""Full-size synthetic HF state dicts with EXACT key names and shapes.

Real-weight rehearsal (SD weights are not present in this environment): these
dicts reproduce, key for key and shape for shape, the checkpoints the
reference loads at runtime —

  SD-v1.4 AutoencoderKL      (utils/sd_utils.py:52-55, 'CompVis/stable-
  SD-v1.4 UNet2DConditionModel  diffusion-v1-4' subfolders vae/unet)
  CLIP ViT-L/14 text encoder (utils/sd_utils.py:60-66)

so diffusion/weights.py converters can be exercised exhaustively (every
source key consumed, every target param filled) without network access.

Two naming vintages are supported where diffusers renamed things:
  '0.2.3'  — the reference's pin: VAE attention uses query/key/value/
             proj_attn Linear weights.
  'modern' — current safetensors releases: to_q/to_k/to_v/to_out.0.
SD-1.x UNet Transformer2D proj_in/proj_out are 1x1 convs in BOTH vintages
(linear projections only appear in SD-2.x).

CLIP key names are emitted by the real `transformers` CLIPTextModel (it is
installed), so they are exact by construction.
"""

from __future__ import annotations

import numpy as np

VAE_BLOCK_OUT = (128, 256, 512, 512)
UNET_BLOCK_OUT = (320, 640, 1280, 1280)
CROSS_DIM = 768
TIME_DIM = 1280
LATENT_CH = 4


def _fill(shape, dtype, rng, scale):
    if rng is None:
        return np.zeros(shape, dtype)
    n = int(np.prod(shape))
    return (rng.standard_normal(n).astype(dtype) * scale).reshape(shape)


class _Builder:
    def __init__(self, dtype=np.float32, seed=None):
        self.sd: dict[str, np.ndarray] = {}
        self.dtype = dtype
        self.rng = np.random.default_rng(seed) if seed is not None else None

    def add(self, name, *shape, scale=0.02):
        assert name not in self.sd, f"duplicate key {name}"
        self.sd[name] = _fill(shape, self.dtype, self.rng, scale)

    def norm(self, prefix, ch):
        # norm scale ~1 keeps activations finite in forward rehearsals
        if self.rng is None:
            self.sd[prefix + ".weight"] = np.ones(ch, self.dtype)
        else:
            self.add(prefix + ".weight", ch, scale=0.02)
            self.sd[prefix + ".weight"] += 1.0
        self.add(prefix + ".bias", ch)
        return self

    def conv(self, prefix, out_c, in_c, k=3):
        self.add(prefix + ".weight", out_c, in_c, k, k)
        self.add(prefix + ".bias", out_c)
        return self

    def linear(self, prefix, out_c, in_c, bias=True):
        self.add(prefix + ".weight", out_c, in_c)
        if bias:
            self.add(prefix + ".bias", out_c)
        return self


def _resnet(b: _Builder, p: str, in_c: int, out_c: int, time_emb: bool):
    b.norm(p + ".norm1", in_c)
    b.conv(p + ".conv1", out_c, in_c)
    if time_emb:
        b.linear(p + ".time_emb_proj", out_c, TIME_DIM)
    b.norm(p + ".norm2", out_c)
    b.conv(p + ".conv2", out_c, out_c)
    if in_c != out_c:
        b.conv(p + ".conv_shortcut", out_c, in_c, k=1)


def _vae_attn(b: _Builder, p: str, ch: int, vintage: str):
    b.norm(p + ".group_norm", ch)
    names = (("query", "key", "value", "proj_attn") if vintage == "0.2.3"
             else ("to_q", "to_k", "to_v", "to_out.0"))
    for n in names:
        b.linear(f"{p}.{n}", ch, ch)


def vae_state_dict(vintage: str = "0.2.3", dtype=np.float32,
                   seed=None) -> dict:
    """SD-v1.4 AutoencoderKL state dict: 248 tensors, 83.65M params."""
    assert vintage in ("0.2.3", "modern")
    b = _Builder(dtype, seed)
    bo = VAE_BLOCK_OUT

    b.conv("encoder.conv_in", bo[0], 3)
    in_c = bo[0]
    for i, out_c in enumerate(bo):
        for j in range(2):
            _resnet(b, f"encoder.down_blocks.{i}.resnets.{j}",
                    in_c if j == 0 else out_c, out_c, time_emb=False)
        if i < len(bo) - 1:
            b.conv(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                   out_c, out_c)
        in_c = out_c
    mid = bo[-1]
    _resnet(b, "encoder.mid_block.resnets.0", mid, mid, False)
    _vae_attn(b, "encoder.mid_block.attentions.0", mid, vintage)
    _resnet(b, "encoder.mid_block.resnets.1", mid, mid, False)
    b.norm("encoder.conv_norm_out", mid)
    b.conv("encoder.conv_out", 2 * LATENT_CH, mid)
    b.conv("quant_conv", 2 * LATENT_CH, 2 * LATENT_CH, k=1)
    b.conv("post_quant_conv", LATENT_CH, LATENT_CH, k=1)

    b.conv("decoder.conv_in", mid, LATENT_CH)
    _resnet(b, "decoder.mid_block.resnets.0", mid, mid, False)
    _vae_attn(b, "decoder.mid_block.attentions.0", mid, vintage)
    _resnet(b, "decoder.mid_block.resnets.1", mid, mid, False)
    rev = list(reversed(bo))  # (512, 512, 256, 128)
    in_c = rev[0]
    for i, out_c in enumerate(rev):
        for j in range(3):
            _resnet(b, f"decoder.up_blocks.{i}.resnets.{j}",
                    in_c if j == 0 else out_c, out_c, time_emb=False)
        if i < len(rev) - 1:
            b.conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", out_c, out_c)
        in_c = out_c
    b.norm("decoder.conv_norm_out", rev[-1])
    b.conv("decoder.conv_out", 3, rev[-1])
    return b.sd


def _tf2d(b: _Builder, p: str, ch: int):
    """SD-1.x Transformer2DModel: 1x1-conv proj_in/out, one BasicTransformerBlock."""
    b.norm(p + ".norm", ch)
    b.conv(p + ".proj_in", ch, ch, k=1)
    blk = p + ".transformer_blocks.0"
    for attn, kv in (("attn1", ch), ("attn2", CROSS_DIM)):
        b.linear(f"{blk}.{attn}.to_q", ch, ch, bias=False)
        b.linear(f"{blk}.{attn}.to_k", ch, kv, bias=False)
        b.linear(f"{blk}.{attn}.to_v", ch, kv, bias=False)
        b.linear(f"{blk}.{attn}.to_out.0", ch, ch)
    b.linear(blk + ".ff.net.0.proj", 8 * ch, ch)  # GEGLU: 2 * (4*ch)
    b.linear(blk + ".ff.net.2", ch, 4 * ch)
    for n in ("norm1", "norm2", "norm3"):
        b.norm(f"{blk}.{n}", ch)
    b.conv(p + ".proj_out", ch, ch, k=1)


def unet_state_dict(dtype=np.float32, seed=None) -> dict:
    """SD-v1.4 UNet2DConditionModel state dict: 686 tensors, 859.52M params."""
    b = _Builder(dtype, seed)
    bo = UNET_BLOCK_OUT
    n = len(bo)

    b.conv("conv_in", bo[0], LATENT_CH)
    b.linear("time_embedding.linear_1", TIME_DIM, bo[0])
    b.linear("time_embedding.linear_2", TIME_DIM, TIME_DIM)

    in_c = bo[0]
    for i, out_c in enumerate(bo):
        for j in range(2):
            _resnet(b, f"down_blocks.{i}.resnets.{j}",
                    in_c if j == 0 else out_c, out_c, time_emb=True)
            if i < n - 1:
                _tf2d(b, f"down_blocks.{i}.attentions.{j}", out_c)
        if i < n - 1:
            b.conv(f"down_blocks.{i}.downsamplers.0.conv", out_c, out_c)
        in_c = out_c

    mid = bo[-1]
    _resnet(b, "mid_block.resnets.0", mid, mid, True)
    _tf2d(b, "mid_block.attentions.0", mid)
    _resnet(b, "mid_block.resnets.1", mid, mid, True)

    # up path: diffusers UNet2DConditionModel skip-channel arithmetic
    rev = list(reversed(bo))  # (1280, 1280, 640, 320)
    prev_out = rev[0]
    for i, out_c in enumerate(rev):
        skip_in = rev[min(i + 1, n - 1)]
        for j in range(3):
            res_skip = skip_in if j == 2 else out_c
            res_in = prev_out if j == 0 else out_c
            _resnet(b, f"up_blocks.{i}.resnets.{j}",
                    res_in + res_skip, out_c, time_emb=True)
            if i > 0:
                _tf2d(b, f"up_blocks.{i}.attentions.{j}", out_c)
        if i < n - 1:
            b.conv(f"up_blocks.{i}.upsamplers.0.conv", out_c, out_c)
        prev_out = out_c

    b.norm("conv_norm_out", bo[0])
    b.conv("conv_out", LATENT_CH, bo[0])
    return b.sd


def clip_state_dict(dtype=np.float32, seed=None) -> dict:
    """CLIP ViT-L/14 text encoder keys, exact by construction: emitted by the
    installed `transformers` CLIPTextModel at the SD-v1.4 text-encoder config
    (hidden 768, 12 layers, 12 heads, vocab 49408, max_pos 77)."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel
    cfg = CLIPTextConfig(vocab_size=49408, hidden_size=768,
                         intermediate_size=3072, num_hidden_layers=12,
                         num_attention_heads=12, max_position_embeddings=77)
    with torch.device("meta"):
        model = CLIPTextModel(cfg)
    rng = np.random.default_rng(seed) if seed is not None else None
    out = {}
    for k, v in model.state_dict().items():
        shape = tuple(v.shape)
        arr = _fill(shape, dtype, rng, 0.02)
        if rng is not None and (k.endswith("layer_norm1.weight") or
                                k.endswith("layer_norm2.weight") or
                                k.endswith("final_layer_norm.weight")):
            arr = arr + 1.0
        out[k] = arr
    return out


PARAM_COUNTS = {  # ground truth for the published SD-v1.4 checkpoints
    "vae": 83_653_863,
    "unet": 859_520_964,
    "clip": 123_060_480,
}


if __name__ == "__main__":
    for name, fn in (("vae(0.2.3)", lambda: vae_state_dict("0.2.3")),
                     ("vae(modern)", lambda: vae_state_dict("modern")),
                     ("unet", unet_state_dict),
                     ("clip", clip_state_dict)):
        sd = fn()
        n = sum(int(np.prod(v.shape)) for v in sd.values())
        print(f"{name}: {len(sd)} tensors, {n/1e6:.2f}M params")
