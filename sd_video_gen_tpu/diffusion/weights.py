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


class _TrackedDict(dict):
    """State dict that records which keys the converters actually read."""

    def __init__(self, sd):
        super().__init__(sd)
        self.consumed: set = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


# checkpoint entries that are buffers/bookkeeping, not convertible params
_IGNORED_KEY_PARTS = ("position_ids", "num_batches_tracked")


def convert_exhaustive(kind: str, sd: dict, **kw):
    """Convert and PROVE every source key was consumed.

    kind in {'vae', 'unet', 'clip', 'transformer'}. Raises ValueError listing
    any key the converter never read (a missed weight would otherwise
    silently keep its random init — the reference's from_pretrained would
    have errored). Returns the converted param tree.
    """
    fns = {"vae": convert_vae, "unet": convert_unet,
           "clip": convert_clip_text,
           "transformer": convert_frame_transformer}
    tracked = _TrackedDict(sd)
    params = fns[kind](tracked, **kw)
    leftover = sorted(
        k for k in sd
        if k not in tracked.consumed
        and not any(part in k for part in _IGNORED_KEY_PARTS))
    if leftover:
        raise ValueError(
            f"convert_{kind}: {len(leftover)} checkpoint keys were never "
            f"consumed (first 20): {leftover[:20]}")
    return params


def assert_matches_model(converted, abstract_variables) -> None:
    """Prove every target param is filled with the right shape.

    ``abstract_variables``: jax.eval_shape of the model's init (costs no
    FLOPs). Raises ValueError on missing/extra/mis-shaped leaves — together
    with convert_exhaustive this is the bidirectional check: checkpoint
    <-> converter <-> model all agree.
    """
    from flax.traverse_util import flatten_dict

    def leaves(tree):
        return {"/".join(map(str, k)): tuple(v.shape)
                for k, v in flatten_dict(tree).items()}

    got, want = leaves(converted), leaves(abstract_variables)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad = sorted(k for k in set(got) & set(want) if got[k] != want[k])
    msgs = []
    if missing:
        msgs.append(f"{len(missing)} params missing from conversion "
                    f"(first 10): {missing[:10]}")
    if extra:
        msgs.append(f"{len(extra)} converted params unknown to the model "
                    f"(first 10): {extra[:10]}")
    if bad:
        msgs.append("shape mismatches: " + "; ".join(
            f"{k}: converted {got[k]} != model {want[k]}" for k in bad[:10]))
    if msgs:
        raise ValueError("converted params do not match model: "
                         + " | ".join(msgs))


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


def _geglu_split(sd, prefix):
    """diffusers fuses the GEGLU h|gate projections into one
    ``ff.net.0.proj`` matmul and chunks the output in half; our UNet keeps
    them as two column-parallel denses (models/unet.py FeedForwardGEGLU —
    tensor-parallel alignment). Split the fused weight exactly: first half
    -> h, second half -> gate (torch chunk(2, dim=-1) order on the OUT
    features, i.e. rows of the torch (out, in) weight)."""
    w = jnp.asarray(sd[prefix + ".weight"])          # (2*dff, in)
    b = jnp.asarray(sd[prefix + ".bias"])            # (2*dff,)
    dff = w.shape[0] // 2
    return {
        "geglu_proj_h": {"kernel": _linear_w(w[:dff]), "bias": b[:dff]},
        "geglu_proj_gate": {"kernel": _linear_w(w[dff:]), "bias": b[dff:]},
    }


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


def convert_clip_text(sd: dict, num_layers: int = 12) -> dict:
    """transformers CLIPTextModel state_dict -> models/clip_text params."""
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""

    def ln(p):
        return {"scale": jnp.asarray(sd[p + ".weight"]),
                "bias": jnp.asarray(sd[p + ".bias"])}

    p: dict = {
        "token_embedding": {"embedding": jnp.asarray(
            sd[pre + "embeddings.token_embedding.weight"])},
        "position_embedding": jnp.asarray(
            sd[pre + "embeddings.position_embedding.weight"]),
        "final_layer_norm": ln(pre + "final_layer_norm"),
    }
    for i in range(num_layers):
        lp = f"{pre}encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "layer_norm1": ln(lp + ".layer_norm1"),
            "layer_norm2": ln(lp + ".layer_norm2"),
            "self_attn": {
                "q_proj": _dense(sd, lp + ".self_attn.q_proj"),
                "k_proj": _dense(sd, lp + ".self_attn.k_proj"),
                "v_proj": _dense(sd, lp + ".self_attn.v_proj"),
                "out_proj": _dense(sd, lp + ".self_attn.out_proj"),
            },
            "fc1": _dense(sd, lp + ".mlp.fc1"),
            "fc2": _dense(sd, lp + ".mlp.fc2"),
        }
    return {"params": p}


def _resnet_t(sd, prefix, has_shortcut):
    out = _resnet(sd, prefix, has_shortcut)
    out["time_emb_proj"] = _dense(sd, prefix + ".time_emb_proj")
    return out


def _tf2d(sd, prefix):
    """diffusers Transformer2DModel -> models/unet.Transformer2D params."""
    b = prefix + ".transformer_blocks.0"

    def attn(p):
        return {"to_q": {"kernel": _linear_w(sd[p + ".to_q.weight"])},
                "to_k": {"kernel": _linear_w(sd[p + ".to_k.weight"])},
                "to_v": {"kernel": _linear_w(sd[p + ".to_v.weight"])},
                "to_out_0": _dense(sd, p + ".to_out.0")}

    def ln(p):
        return {"scale": jnp.asarray(sd[p + ".weight"]),
                "bias": jnp.asarray(sd[p + ".bias"])}

    return {
        "norm": _norm(sd, prefix + ".norm"),
        "proj_in": _conv(sd, prefix + ".proj_in"),
        "proj_out": _conv(sd, prefix + ".proj_out"),
        "block_0": {
            "norm1": ln(b + ".norm1"),
            "attn1": attn(b + ".attn1"),
            "norm2": ln(b + ".norm2"),
            "attn2": attn(b + ".attn2"),
            "norm3": ln(b + ".norm3"),
            "ff": {**_geglu_split(sd, b + ".ff.net.0.proj"),
                   "out_proj": _dense(sd, b + ".ff.net.2")},
        },
    }


def convert_unet(sd: dict, block_out=(320, 640, 1280, 1280),
                 layers_per_block: int = 2) -> dict:
    """diffusers UNet2DConditionModel state_dict -> models/unet params."""
    n = len(block_out)
    p: dict = {
        "time_embedding": {"linear_1": _dense(sd, "time_embedding.linear_1"),
                           "linear_2": _dense(sd, "time_embedding.linear_2")},
        "conv_in": _conv(sd, "conv_in"),
        "norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_res_0": _resnet_t(sd, "mid_block.resnets.0", False),
        "mid_attn": _tf2d(sd, "mid_block.attentions.0"),
        "mid_res_1": _resnet_t(sd, "mid_block.resnets.1", False),
    }
    for i in range(n):
        has_attn = i < n - 1
        for j in range(layers_per_block):
            pre = f"down_blocks.{i}.resnets.{j}"
            p[f"down_{i}_res_{j}"] = _resnet_t(
                sd, pre, (pre + ".conv_shortcut.weight") in sd)
            if has_attn:
                p[f"down_{i}_attn_{j}"] = _tf2d(
                    sd, f"down_blocks.{i}.attentions.{j}")
        if i < n - 1:
            p[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
    for i in range(n):
        has_attn = i > 0
        for j in range(layers_per_block + 1):
            pre = f"up_blocks.{i}.resnets.{j}"
            p[f"up_{i}_res_{j}"] = _resnet_t(
                sd, pre, (pre + ".conv_shortcut.weight") in sd)
            if has_attn:
                p[f"up_{i}_attn_{j}"] = _tf2d(
                    sd, f"up_blocks.{i}.attentions.{j}")
        if i < n - 1:
            p[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}
    return {"params": p}


def convert_vae(sd: dict, block_out=(128, 256, 512, 512),
                layers_per_block: int = 2) -> dict:
    """diffusers AutoencoderKL state_dict -> params for models/vae.AutoencoderKL."""
    n = len(block_out)
    enc: dict = {"conv_in": _conv(sd, "encoder.conv_in"),
                 "norm_out": _norm(sd, "encoder.conv_norm_out"),
                 "conv_out": _conv(sd, "encoder.conv_out")}
    for i in range(n):
        for j in range(layers_per_block):
            p = f"encoder.down_blocks.{i}.resnets.{j}"
            enc[f"down_{i}_res_{j}"] = _resnet(
                sd, p, has_shortcut=(p + ".conv_shortcut.weight") in sd)
        if i < n - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}
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


def convert_frame_transformer(sd: dict, mode: str = "ar") -> dict:
    """Reference trainer checkpoint -> FrameTransformer params.

    The reference saves ``torch.save(model.state_dict())`` of its
    models/transformer*.py classes (trainers/trainer.py:472, loaded back at
    prediction/predict.py:51). Key map:

      embedding / project_image_embedding / out   Linear -> Dense (transpose)
      layers.N.self_attn.in_proj_weight (3D, D)   -> fused qkv Dense (D, 3D)
      decoder layers.N.multihead_attn.in_proj     -> cross_attn q/k/v split
      layers.N.linear1/linear2                    -> ffn lin1/lin2
      layers.N.norm1/2/3                          -> norm1/2/3 (scale/bias)
      transformer.encoder.norm / decoder.norm     -> enc_norm / dec_norm
                                                     (the stacks' FINAL LNs)
      learned_tgt (future) / query_pos + norm (learned_tgt) -> same names
      positional_encoder.pos_encoding buffer      -> consumed only; positions
                                                     are generated functionally
                                                     (models/positional.py)
    """
    for k in list(sd):  # positional buffer: bookkeeping, not a param
        if "positional_encoder" in k:
            _ = sd[k]
        # text mode: the reference registers the frozen SentenceTransformer
        # as a submodule (models/transformer_text.py `self.sent_transformer`),
        # so its state_dict carries hundreds of sent_transformer.* weights.
        # Those are the frozen MiniLM text encoder — replaced here by the
        # exported embedding table (models/text_embed.py) — so they are
        # deliberately consumed and dropped.
        elif mode == "text" and k.startswith("sent_transformer."):
            _ = sd[k]

    def fused_attn(p):
        w = np.asarray(sd[p + ".in_proj_weight"])
        b = np.asarray(sd[p + ".in_proj_bias"])
        return {"qkv": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)},
                "out": _dense(sd, p + ".out_proj")}

    def split_attn(p):
        w = np.asarray(sd[p + ".in_proj_weight"])
        b = np.asarray(sd[p + ".in_proj_bias"])
        D = w.shape[0] // 3
        parts = {}
        for j, name in enumerate(("q", "k", "v")):
            parts[name] = {"kernel": jnp.asarray(w[j * D:(j + 1) * D].T),
                           "bias": jnp.asarray(b[j * D:(j + 1) * D])}
        parts["out"] = _dense(sd, p + ".out_proj")
        return parts

    def ffn(p):
        return {"lin1": _dense(sd, p + ".linear1"),
                "lin2": _dense(sd, p + ".linear2")}

    p: dict = {}
    embed = "project_image_embedding" if mode == "text" else "embedding"
    p[embed] = _dense(sd, embed)
    p["out"] = _dense(sd, "out")
    if mode == "future":
        p["learned_tgt"] = jnp.asarray(np.asarray(sd["learned_tgt"]))
    if mode == "learned_tgt":
        p["query_pos"] = jnp.asarray(np.asarray(sd["query_pos"]))
        p["tgt_norm"] = _norm(sd, "norm")

    i = 0
    while f"transformer.encoder.layers.{i}.norm1.weight" in sd:
        lp = f"transformer.encoder.layers.{i}"
        p[f"enc_{i}"] = {"self_attn": fused_attn(lp + ".self_attn"),
                         "ffn": ffn(lp),
                         "norm1": _norm(sd, lp + ".norm1"),
                         "norm2": _norm(sd, lp + ".norm2")}
        i += 1
    p["enc_norm"] = _norm(sd, "transformer.encoder.norm")
    i = 0
    while f"transformer.decoder.layers.{i}.norm1.weight" in sd:
        lp = f"transformer.decoder.layers.{i}"
        p[f"dec_{i}"] = {"self_attn": fused_attn(lp + ".self_attn"),
                         "cross_attn": split_attn(lp + ".multihead_attn"),
                         "ffn": ffn(lp),
                         "norm1": _norm(sd, lp + ".norm1"),
                         "norm2": _norm(sd, lp + ".norm2"),
                         "norm3": _norm(sd, lp + ".norm3")}
        i += 1
    p["dec_norm"] = _norm(sd, "transformer.decoder.norm")
    return {"params": p}
