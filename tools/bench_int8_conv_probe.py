"""Int8 convolution rate probe: does XLA:TPU run s8xs8->s32 convs at 2x bf16?

Decision gate for an int8 denoise serving path (the UNet/VAE convs sit at
0.41/0.76 MFU bf16 — tools/roofline_denoise.py). The v5e MXU's int8 rate is
2x bf16; IF XLA lowers int8 convolutions onto it, quantizing the serving
UNet/VAE convs is worth ~15-30% of north-star throughput. If int8 convs
fall back to a slow path (upcast or VPU), the project is dead on arrival —
measure before building.

Shapes = the denoise pipeline's hot convs (models/unet.py at 64x64 latent,
models/vae.py at 512px decode):

  python tools/bench_int8_conv_probe.py        # on the chip
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from sd_video_gen_tpu.utils.backend import init_backend_or_die

init_backend_or_die("bench_int8_conv_probe")

import jax
import jax.numpy as jnp
import numpy as np

from tools._bench_harness import measure

# (name, B, H, W, Cin, Cout) — 3x3 SAME convs
SHAPES = [
    ("unet_mid_8x64x64x320", 8, 64, 64, 320, 320),
    ("unet_down_8x32x32x640", 8, 32, 32, 640, 640),
    ("unet_deep_8x16x16x1280", 8, 16, 16, 1280, 1280),
    ("vae_dec_8x512x512x128", 8, 512, 512, 128, 128),
    ("vae_dec_8x256x256x256", 8, 256, 256, 256, 256),
]


def conv(x, w, acc_dtype):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def main():
    rng = np.random.default_rng(0)
    for name, B, H, W, Ci, Co in SHAPES:
        xf = rng.standard_normal((B, H, W, Ci)).astype(np.float32)
        wf = rng.standard_normal((3, 3, Ci, Co)).astype(np.float32)
        x8 = np.clip(np.round(xf * 16), -127, 127).astype(np.int8)
        w8 = np.clip(np.round(wf * 16), -127, 127).astype(np.int8)
        flops = 2 * B * H * W * Ci * Co * 9
        row = {"shape": name}
        for tag, x, w, acc in (
                ("bf16", jnp.asarray(xf, jnp.bfloat16),
                 jnp.asarray(wf, jnp.bfloat16), jnp.float32),
                ("int8", jnp.asarray(x8), jnp.asarray(w8), jnp.int32)):
            try:
                dt = measure(lambda x, w: conv(x, w, acc), x, w)
                row[f"{tag}_ms"] = round(dt * 1e3, 3)
                row[f"{tag}_tflops"] = round(flops / dt / 1e12, 1)
            except Exception as e:  # int8 conv may be unsupported — that IS the answer
                row[f"{tag}_error"] = f"{type(e).__name__}: {e}"[:200]
        if "bf16_ms" in row and "int8_ms" in row:
            row["int8_speedup"] = round(row["bf16_ms"] / row["int8_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
