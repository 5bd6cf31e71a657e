"""Knee search on the real chip for the two VERDICT-r2 weak scenarios.

  train:   flagship train step across (precision, batch) — finds the
           TPU-efficient operating point behind train_flagship_tuned
           (the reference's batch 6 is a 3090-memory artifact).
  denoise: the north-star encode->predict->denoise->decode pipeline across
           stream counts (per-item UNet cost halves B=1->8 in r2; the curve
           was never followed past 8).

Usage: python tools/bench_knee.py [train|denoise|all]
One JSON line per point; safe to rerun (XLA cache warm).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import bench

    if which in ("all", "train"):
        grid = [("f32", 6), ("bf16", 6), ("bf16_full", 6),
                ("bf16_full", 24), ("bf16_full", 48), ("bf16_full", 96),
                ("bf16", 48)]
        for precision, batch in grid:
            try:
                v, _ = bench.scenario_train(batch=batch, precision=precision)
            except Exception as e:  # noqa: BLE001 — keep sweeping on OOM
                print(json.dumps({"case": f"train_{precision}_b{batch}",
                                  "error": str(e)[:160]}), flush=True)
                continue
            print(json.dumps({"case": f"train_{precision}_b{batch}",
                              "steps_per_s": round(v, 2),
                              "clips_per_s": round(v * batch, 1)}),
                  flush=True)

    if which in ("all", "denoise"):
        for b in (8, 16, 32):
            try:
                v, _ = bench.scenario_denoise(batch=b)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"case": f"denoise_b{b}",
                                  "error": str(e)[:160]}), flush=True)
                continue
            print(json.dumps({"case": f"denoise_b{b}",
                              "frames_per_s_chip": round(v, 2)}), flush=True)


if __name__ == "__main__":
    main()
