"""Mesh-scaling smoke: per-device-count throughput table (VERDICT r1 item 6).

Runs the batch-sharded AR rollout pipeline (the bench.py pixel scenario,
scaled down) over virtual CPU meshes of 1/2/4/8 devices and prints one JSON
line per device count. This is a CORRECTNESS + scaling-shape smoke, not an
absolute perf number: the host is a 1-core CPU, so per-device times are
emulated-serial and the interesting signal is that the sharded program
compiles, runs, and partitions the batch (per-device batch shrinks as the
mesh grows; a sharding bug would show as replicated work or a crash). Real
TPU numbers stay single-chip (bench.py) until multi-chip hardware exists.

Usage:  python tools/bench_mesh.py  [--devices 1,2,4,8] [--tp]
  --tp uses a data x model mesh (TP=2) for counts >= 2 instead of pure DP.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MAX_DEV = 8
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           f" --xla_force_host_platform_device_count={MAX_DEV}")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

FRAME_SIZE = 32
CONTEXT = 3
PRED = 4
GLOBAL_BATCH = 16


def run(n: int, tp: bool) -> dict:
    from sd_video_gen_tpu.codecs import PixelCodec
    from sd_video_gen_tpu.models import FrameTransformer, FrameTransformerConfig
    from sd_video_gen_tpu.ops.rollout import ar_rollout
    from sd_video_gen_tpu.parallel import (make_mesh, param_shardings,
                                           batch_sharding)

    t = 2 if (tp and n >= 2) else 1
    mesh = make_mesh(f"data={n // t},model={t}", devices=jax.devices()[:n])

    codec = PixelCodec(FRAME_SIZE)
    mc = FrameTransformerConfig(latent_dim=codec.latent_dim, dim_model=128,
                                num_heads=4, num_encoder_layers=2,
                                num_decoder_layers=2, dropout_p=0.0)
    model = FrameTransformer(mc)

    frames = np.random.default_rng(0).integers(
        0, 255, (GLOBAL_BATCH, CONTEXT, FRAME_SIZE, FRAME_SIZE, 3)
    ).astype(np.uint8)
    lat = codec.encode_batch(jnp.asarray(frames), use_sos=True)
    params = model.init(jax.random.PRNGKey(0), lat, lat[:, :-1])

    params = jax.device_put(params, param_shardings(mesh, params))
    x = jax.device_put(jnp.asarray(frames), batch_sharding(mesh))

    @jax.jit
    def pipeline(params, frames_u8):
        lat = codec.encode_batch(frames_u8, use_sos=True)
        preds = ar_rollout(model.apply, params, lat, PRED, window=CONTEXT)
        out = codec.decode_latents(preds.reshape(-1, codec.latent_dim))
        return jnp.sum(out.astype(jnp.int32))

    chk = int(pipeline(params, x))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(pipeline(params, x))
        best = min(best, time.perf_counter() - t0)

    # verify the batch axis is actually partitioned across the data axis
    lat_sharded = jax.jit(lambda f: codec.encode_batch(f, use_sos=True))(x)
    n_data = mesh.shape["data"]
    addressable = lat_sharded.addressable_shards
    per_dev_batch = addressable[0].data.shape[0]
    assert per_dev_batch == GLOBAL_BATCH // n_data, \
        f"batch not partitioned: shard batch {per_dev_batch} on data={n_data}"

    return {"devices": n, "mesh": f"data={n // t},model={t}",
            "frames_per_sec": round(GLOBAL_BATCH * PRED / best, 1),
            "per_device_batch": per_dev_batch, "checksum": chk}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--tp", action="store_true")
    args = ap.parse_args()

    rows = []
    for n in (int(s) for s in args.devices.split(",")):
        row = run(n, args.tp)
        rows.append(row)
        print(json.dumps(row), flush=True)
    # f32 reduction order differs across mesh shapes; a handful of decoded
    # pixels may round the other way at the .5 boundary. Allow a few LSBs
    # out of a ~2e7 pixel sum; anything larger means a sharding bug.
    base = rows[0]["checksum"]
    worst = max(abs(r["checksum"] - base) for r in rows)
    ok = worst <= 64
    print(json.dumps({"checksums_match_across_device_counts": ok,
                      "max_abs_checksum_diff": worst}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
