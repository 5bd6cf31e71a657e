"""UNet2DCondition parity vs a torch mirror with diffusers state_dict naming,
through convert_unet — covers timestep embeddings, temb-injected resnets,
GEGLU transformer blocks, skip-concat topology, down/up sampling."""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax.numpy as jnp

from sd_video_gen_tpu.models.unet import UNet2DCondition, UNetConfig
from sd_video_gen_tpu.diffusion.weights import convert_unet

BLOCKS = (8, 16)
LAYERS = 1
GROUPS = 2
HEADS = 2
CTX = 8
TEMB = BLOCKS[0] * 4


def t_timestep_embedding(t, dim):
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    emb = t.float()[:, None] * torch.exp(exponent)[None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TResnetT(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(GROUPS, cin, eps=1e-5)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(TEMB, cout)
        self.norm2 = tnn.GroupNorm(GROUPS, cout, eps=1e-5)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TCrossAttn(tnn.Module):
    def __init__(self, dim, ctx_dim=None):
        super().__init__()
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_v = tnn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])
        self.dim = dim

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        B, T, _ = x.shape
        hd = self.dim // HEADS
        q = self.to_q(x).reshape(B, T, HEADS, hd).permute(0, 2, 1, 3)
        k = self.to_k(ctx).reshape(B, ctx.shape[1], HEADS, hd).permute(0, 2, 1, 3)
        v = self.to_v(ctx).reshape(B, ctx.shape[1], HEADS, hd).permute(0, 2, 1, 3)
        w = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
        o = (w @ v).permute(0, 2, 1, 3).reshape(B, T, self.dim)
        return self.to_out[0](o)


class TGEGLU(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = tnn.Linear(dim, 8 * dim)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TBasicBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TCrossAttn(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TCrossAttn(dim, CTX)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = tnn.Module()
        self.ff.net = tnn.ModuleList([TGEGLU(dim), tnn.Identity(),
                                      tnn.Linear(4 * dim, dim)])

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff.net[2](self.ff.net[0](self.norm3(x)))
        return x


class TTransformer2D(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.GroupNorm(GROUPS, c, eps=1e-6)
        self.proj_in = tnn.Conv2d(c, c, 1)
        self.transformer_blocks = tnn.ModuleList([TBasicBlock(c)])
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.reshape(B, C, H * W).permute(0, 2, 1)
        h = self.transformer_blocks[0](h, ctx)
        h = h.permute(0, 2, 1).reshape(B, C, H, W)
        return self.proj_out(h) + res


class TDown(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TUp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TUNet(tnn.Module):
    """Mirror of SD UNet topology at tiny scale, diffusers key names."""

    def __init__(self):
        super().__init__()
        self.time_embedding = tnn.Module()
        self.time_embedding.linear_1 = tnn.Linear(BLOCKS[0], TEMB)
        self.time_embedding.linear_2 = tnn.Linear(TEMB, TEMB)
        self.conv_in = tnn.Conv2d(4, BLOCKS[0], 3, padding=1)

        db0 = tnn.Module()
        db0.resnets = tnn.ModuleList([TResnetT(BLOCKS[0], BLOCKS[0])])
        db0.attentions = tnn.ModuleList([TTransformer2D(BLOCKS[0])])
        db0.downsamplers = tnn.ModuleList([TDown(BLOCKS[0])])
        db1 = tnn.Module()
        db1.resnets = tnn.ModuleList([TResnetT(BLOCKS[0], BLOCKS[1])])
        self.down_blocks = tnn.ModuleList([db0, db1])

        self.mid_block = tnn.Module()
        self.mid_block.resnets = tnn.ModuleList(
            [TResnetT(BLOCKS[1], BLOCKS[1]), TResnetT(BLOCKS[1], BLOCKS[1])])
        self.mid_block.attentions = tnn.ModuleList([TTransformer2D(BLOCKS[1])])

        # up block 0 (plain, 16): skips popped: d1r0(16), d0down(8)
        ub0 = tnn.Module()
        ub0.resnets = tnn.ModuleList([TResnetT(BLOCKS[1] + BLOCKS[1], BLOCKS[1]),
                                      TResnetT(BLOCKS[1] + BLOCKS[0], BLOCKS[1])])
        ub0.upsamplers = tnn.ModuleList([TUp(BLOCKS[1])])
        # up block 1 (attn, 8): skips: d0r0(8), conv_in(8)
        ub1 = tnn.Module()
        ub1.resnets = tnn.ModuleList([TResnetT(BLOCKS[1] + BLOCKS[0], BLOCKS[0]),
                                      TResnetT(BLOCKS[0] + BLOCKS[0], BLOCKS[0])])
        ub1.attentions = tnn.ModuleList([TTransformer2D(BLOCKS[0]),
                                         TTransformer2D(BLOCKS[0])])
        self.up_blocks = tnn.ModuleList([ub0, ub1])

        self.conv_norm_out = tnn.GroupNorm(GROUPS, BLOCKS[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(BLOCKS[0], 4, 3, padding=1)

    def forward(self, x, t, ctx):
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(t_timestep_embedding(t, BLOCKS[0]))))
        x = self.conv_in(x)
        skips = [x]
        x = self.down_blocks[0].resnets[0](x, temb)
        x = self.down_blocks[0].attentions[0](x, ctx)
        skips.append(x)
        x = self.down_blocks[0].downsamplers[0](x)
        skips.append(x)
        x = self.down_blocks[1].resnets[0](x, temb)
        skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, temb)

        for j in range(2):
            x = self.up_blocks[0].resnets[j](
                torch.cat([x, skips.pop()], dim=1), temb)
        x = self.up_blocks[0].upsamplers[0](x)
        for j in range(2):
            x = self.up_blocks[1].resnets[j](
                torch.cat([x, skips.pop()], dim=1), temb)
            x = self.up_blocks[1].attentions[j](x, ctx)

        return self.conv_out(F.silu(self.conv_norm_out(x)))


def test_unet_parity(rng):
    torch.manual_seed(0)
    tun = TUNet().eval()
    sd = {k: v.numpy() for k, v in tun.state_dict().items()}
    params = convert_unet(sd, block_out=BLOCKS, layers_per_block=LAYERS)

    cfg = UNetConfig(block_out_channels=BLOCKS, layers_per_block=LAYERS,
                     attention_heads=HEADS, cross_attention_dim=CTX,
                     norm_num_groups=GROUPS)
    jun = UNet2DCondition(cfg)

    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([10, 500], np.int64)
    ctx = rng.standard_normal((2, 5, CTX)).astype(np.float32)
    with torch.no_grad():
        ref = tun(torch.tensor(x), torch.tensor(t), torch.tensor(ctx)).numpy()
    ours = jun.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t, jnp.int32), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=2e-4, atol=2e-5)


def test_unet_concat_order(rng):
    """Skip concat order: diffusers concatenates [x, skip] along channels —
    the converter relies on this; verify via shortcut kernel shape usage."""
    torch.manual_seed(1)
    tun = TUNet().eval()
    # up_blocks.0.resnets.0 input = 16(x) + 16(skip): norm1 has 32 channels
    assert tun.up_blocks[0].resnets[0].norm1.num_channels == 32


def test_timestep_embedding_flip():
    from sd_video_gen_tpu.models.unet import timestep_embedding
    t = jnp.asarray([3.0, 77.0])
    emb = timestep_embedding(t, 8, flip_sin_to_cos=True)
    ref = t_timestep_embedding(torch.tensor([3.0, 77.0]), 8).numpy()
    np.testing.assert_allclose(np.asarray(emb), ref, rtol=1e-5, atol=1e-6)
