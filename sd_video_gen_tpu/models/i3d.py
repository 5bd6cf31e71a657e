"""InceptionI3d (Kinetics-400) in JAX/Flax for FVD evaluation, NDHWC.

The reference evaluates FVD through two torch I3D flavors: an opaque
TorchScript detector (evaluation/fvd.py:56-65) and the explicit graph of
evaluation/pytorch_i3d.py (loaded by evaluation/fvd_2.py:91-97). This is a
TPU-native implementation of that Inception-v1 I3D graph:

  - NDHWC (B, T, H, W, C); 3D convs via flax nn.Conv with 'SAME' padding —
    XLA's SAME is exactly the TF-style dynamic same-padding the torch code
    re-implements by hand (pytorch_i3d.py:8-36, 80-105)
  - inference-only BatchNorm folded to per-channel affine
  - endpoint graph: Conv3d_1a..Mixed_5c -> avgpool(2,7,7) -> logits(400)
    -> mean over time (pytorch_i3d.py:152-171, 322)

Weights convert from the torch state_dict (convert_i3d below); the
`models/convert_tf_pretrained.py` TF-hub path in the reference produces that
same state_dict layout.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class I3DConfig:
    num_classes: int = 400
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32


class Unit3D(nn.Module):
    """conv3d (SAME) + frozen BN affine + optional ReLU."""

    cfg: I3DConfig
    out_channels: int
    kernel: tuple = (1, 1, 1)
    stride: tuple = (1, 1, 1)
    use_bn: bool = True
    use_bias: bool = False
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Conv(self.out_channels, self.kernel, strides=self.stride,
                    padding="SAME", use_bias=self.use_bias, dtype=c.dtype,
                    param_dtype=c.param_dtype, name="conv3d")(x)
        if self.use_bn:
            # inference-only BN: y = (x - mean) / sqrt(var + eps) * g + b
            shape = (self.out_channels,)
            g = self.param("bn_scale", nn.initializers.ones, shape,
                           c.param_dtype)
            b = self.param("bn_bias", nn.initializers.zeros, shape,
                           c.param_dtype)
            mean = self.param("bn_mean", nn.initializers.zeros, shape,
                              c.param_dtype)
            var = self.param("bn_var", nn.initializers.ones, shape,
                             c.param_dtype)
            # eps=1e-5 pins the REFERENCE torch module (pytorch_i3d.py:70
            # 'nn.BatchNorm3d(..., eps=1e-5, momentum=0.001)' — the 0.001
            # there is MOMENTUM, not eps; the TF-slim original used 1e-3)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * g + b
        if self.relu:
            x = nn.relu(x)
        return x


def _max_pool_same(x, kernel, stride):
    return nn.max_pool(x, kernel, strides=stride, padding="SAME")


class InceptionModule(nn.Module):
    cfg: I3DConfig
    out: tuple  # (b0, b1a, b1b, b2a, b2b, b3b)

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        o = self.out
        b0 = Unit3D(c, o[0], name="b0")(x)
        b1 = Unit3D(c, o[2], (3, 3, 3), name="b1b")(Unit3D(c, o[1], name="b1a")(x))
        b2 = Unit3D(c, o[4], (3, 3, 3), name="b2b")(Unit3D(c, o[3], name="b2a")(x))
        b3 = Unit3D(c, o[5], name="b3b")(
            _max_pool_same(x, (3, 3, 3), (1, 1, 1)))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# (name, out_channels tuple) for the Mixed blocks, in graph order.
_MIXED = [
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
]


class InceptionI3d(nn.Module):
    """(B, T, 224, 224, 3) in [-1,1] -> logits (B, num_classes)."""

    cfg: I3DConfig = I3DConfig()

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        c = self.cfg
        mixed = dict(_MIXED)
        x = Unit3D(c, 64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(c, 64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(c, 192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule(c, mixed["Mixed_3b"], name="Mixed_3b")(x)
        x = InceptionModule(c, mixed["Mixed_3c"], name="Mixed_3c")(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                     "Mixed_4f"):
            x = InceptionModule(c, mixed[name], name=name)(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule(c, mixed["Mixed_5b"], name="Mixed_5b")(x)
        x = InceptionModule(c, mixed["Mixed_5c"], name="Mixed_5c")(x)

        # avg_pool (2,7,7) stride 1, VALID
        feats = nn.avg_pool(x, (2, 7, 7), strides=(1, 1, 1), padding="VALID")
        if return_features:
            return feats
        logits = Unit3D(c, c.num_classes, use_bn=False, use_bias=True,
                        relu=False, name="logits")(feats)
        # squeeze spatial, mean over time (pytorch_i3d.py:316-320)
        logits = logits.squeeze(axis=(2, 3))
        return logits.mean(axis=1)


def convert_i3d(sd: dict) -> dict:
    """torch InceptionI3d state_dict -> params for this module."""
    import numpy as np

    def unit(prefix, use_bn=True, use_bias=False):
        out = {"conv3d": {"kernel": jnp.asarray(np.transpose(
            sd[prefix + ".conv3d.weight"], (2, 3, 4, 1, 0)))}}
        if use_bias:
            out["conv3d"]["bias"] = jnp.asarray(sd[prefix + ".conv3d.bias"])
        if use_bn:
            out["bn_scale"] = jnp.asarray(sd[prefix + ".bn.weight"])
            out["bn_bias"] = jnp.asarray(sd[prefix + ".bn.bias"])
            out["bn_mean"] = jnp.asarray(sd[prefix + ".bn.running_mean"])
            out["bn_var"] = jnp.asarray(sd[prefix + ".bn.running_var"])
        return out

    p = {"Conv3d_1a_7x7": unit("Conv3d_1a_7x7"),
         "Conv3d_2b_1x1": unit("Conv3d_2b_1x1"),
         "Conv3d_2c_3x3": unit("Conv3d_2c_3x3"),
         "logits": unit("logits", use_bn=False, use_bias=True)}
    for name, _ in _MIXED:
        p[name] = {b: unit(f"{name}.{b}")
                   for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")}
    return {"params": p}
