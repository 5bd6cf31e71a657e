"""bench.py static consistency — protects the driver artifact.

The per-scenario try/except in bench.main wraps only the measurement
call; the ``value / BASELINES[name]`` division happens after it, so a
SCENARIOS entry without a BASELINES key would raise an uncaught KeyError
and turn the ENTIRE driver bench run red. Pin the invariant here (the
dpmpp scenario was added in r4 — this is the class of edit that can
reintroduce the mismatch).
"""

import importlib
import sys


def test_every_scenario_has_a_baseline(monkeypatch):
    monkeypatch.setenv("SDVG_BENCH_SCENARIOS", "")
    sys.modules.pop("bench", None)
    bench = importlib.import_module("bench")
    names = {name for name, _ in bench.SCENARIOS}
    missing = names - set(bench.BASELINES)
    assert not missing, f"SCENARIOS without BASELINES entries: {missing}"
    # the final-emit primary lookup must reference real scenario names
    assert {"vae_denoise_ar4_8streams", "vae_denoise_ar4"} <= names


def test_all_verbatim_entry_shims_import():
    """The reference-compatible root-level entry points (PARITY.md map) are
    the product's front door — a broken import in any shim breaks the
    'every original CLI works verbatim' contract silently until a user
    hits it."""
    mods = ["trainers.trainer", "trainers.trainer_diff", "trainers.trainer_fvd",
            "trainers.trainer_predict_future", "trainers.trainer_text",
            "prediction.predict", "prediction.predict_diff",
            "prediction.predict_future", "prediction.predict_naive_and_mnist",
            "prediction.predict_naive_fvd", "prediction.predict_text",
            "prediction.run_frame_interpolation",
            "evaluation.predict_fvd", "evaluation.predict_fvd2",
            "evaluation.predict_fvd2_denoise",
            "evaluation.compute_fvd_from_files"]
    for m in mods:
        importlib.import_module(m)
