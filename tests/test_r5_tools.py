"""Round-5 tooling: the W&B measured-baseline miner and the dpmpp gate.

tools/reference_baseline.py turns the reference's shipped W&B artifacts
(/root/reference/wandb/run-*/files/) into MEASURED RTX-3090 train
throughput — the denominator bench.py's train_ref_artifact scenario
divides by. tools/dpmpp_quality_gate.py gates the fast-sampler tail on
video-level FVD with one-sided no-worse-than semantics. Both are pure
host logic; these tests pin them against synthetic artifacts.
"""

import json
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.reference_baseline import parse_run  # noqa: E402


def _mk_run(tmp_path, name, *, batch=64, n_samples=10340, epoch_ratio=1.0,
            train_bars=(), val_bars=(), unit="s/it",
            args=("--dataset", "ucf", "--config", "config_test")):
    """Synthetic wandb run dir in the reference's recorded layout."""
    d = tmp_path / f"run-{name}"
    files = d / "files"
    files.mkdir(parents=True)
    (files / "wandb-metadata.json").write_text(json.dumps(
        {"args": list(args), "gpu": "NVIDIA GeForce RTX 3090"}))
    (files / "config.yaml").write_text(
        "batch_size:\n  desc: null\n  value: %d\n"
        "dim_model:\n  desc: null\n  value: 256\n"
        "epoch_ratio:\n  desc: null\n  value: %s\n"
        "num_encoder_layers:\n  desc: null\n  value: 6\n"
        "num_decoder_layers:\n  desc: null\n  value: 6\n"
        % (batch, epoch_ratio))
    expected = math.ceil(n_samples * epoch_ratio / batch)
    lines = [f"Number of training samples:  {n_samples}"]
    # interleave train/val bars the way the recorded logs do; a 9/9
    # VideoClips metadata bar up front must NOT be counted as training
    lines.append("META| 9/9 [00:00<00:00, 12.82it/s]")
    for i, rate in enumerate(train_bars):  # literal printed tqdm rate
        lines.append(f"TRAIN| {expected}/{expected} "
                     f"[04:12<00:00,  {rate:.2f}{unit}]")
        if i < len(val_bars):
            lines.append(f"VAL| 41/41 [00:10<00:00,  {val_bars[i]:.2f}s/it]")
    (files / "output.log").write_text("\n".join(lines) + "\n")
    return str(d)


def test_parse_run_steady_median_drops_warmup_epoch(tmp_path):
    # epoch 1 absorbs CUDA/cuDNN warmup: 2.50; steady epochs 1.56/1.54/1.58
    d = _mk_run(tmp_path, "steady", train_bars=(2.50, 1.56, 1.54, 1.58),
                val_bars=(0.5, 0.5, 0.5, 0.5))
    r = parse_run(d)
    assert r is not None
    assert r["provenance"] == "steady"          # 162 batches/epoch >= 50
    assert r["train_batches_per_epoch"] == 162
    assert r["epochs_measured"] == 4
    assert r["s_per_it_median"] == 1.56          # median of steady 3, not 2.5
    assert r["clips_per_s"] == pytest.approx(64 / 1.56, abs=0.01)
    assert r["dataset"] == "ucf" and r["config"] == "config_test"


def test_parse_run_it_per_s_unit_and_warmup_label(tmp_path):
    # EPOCH_RATIO=0.01 -> 2 batches/epoch -> warmup provenance; bars in it/s
    d = _mk_run(tmp_path, "warm", epoch_ratio=0.01, n_samples=10340,
                train_bars=(4.0, 4.0), unit="it/s")
    r = parse_run(d)
    assert r is not None
    assert r["provenance"] == "warmup"
    assert r["train_batches_per_epoch"] == 2
    # 4 it/s == 0.25 s/it
    assert r["s_per_it_median"] == pytest.approx(0.25, abs=1e-3)


def test_parse_run_rejects_runs_without_train_bars(tmp_path):
    d = _mk_run(tmp_path, "empty", train_bars=())
    assert parse_run(d) is None


def test_real_reference_anchor_is_stable():
    """The r4f87l3x anchor BASELINES['train_ref_artifact'] divides by."""
    d = "/root/reference/wandb/run-20221118_002412-r4f87l3x"
    if not os.path.isdir(d):
        pytest.skip("reference wandb artifacts not present")
    r = parse_run(d)
    assert r is not None and r["provenance"] == "steady"
    assert r["batch_size"] == 64
    assert r["clips_per_s"] == pytest.approx(41.56, abs=0.05)


# ---------------------------------------------------------------------------
# dpmpp gate: one-sided no-worse-than semantics over a cached Phase A


def _gate(tmp_path, arms):
    from tools.dpmpp_quality_gate import main
    (tmp_path / "dpmpp_gate_arms.json").write_text(json.dumps(arms))
    rc = main(["--scratch", str(tmp_path), "--skip_fvd", "--skip_drift"])
    report = json.loads((tmp_path / "dpmpp_gate.json").read_text())
    return rc, report


def _arms(fvd5, mse5, fvd4=None, mse4=None):
    return {"none": {"clips": 6, "fvd": 6.0, "mse": 0.027},
            "ddim10": {"clips": 6, "fvd": 8.0, "mse": 0.040},
            "dpmpp5": {"clips": 6, "fvd": fvd5, "mse": mse5},
            "dpmpp4": {"clips": 6, "fvd": fvd4 if fvd4 is not None else fvd5,
                       "mse": mse4 if mse4 is not None else mse5}}


def test_gate_better_than_ddim_passes(tmp_path):
    # the measured r5 situation: dpmpp ~48% BETTER FVD must not fail
    rc, rep = _gate(tmp_path, _arms(fvd5=4.4, mse5=0.0376))
    assert rc == 0 and rep["pass"] is True
    assert rep["gate_dpmpp5"]["rel_fvd_gap"] < 0  # signed, negative=better


def test_gate_slightly_worse_within_tol_passes(tmp_path):
    rc, rep = _gate(tmp_path, _arms(fvd5=8.8, mse5=0.044))  # +10% both
    assert rc == 0 and rep["pass"] is True


def test_gate_worse_beyond_tol_fails(tmp_path):
    rc, rep = _gate(tmp_path, _arms(fvd5=9.8, mse5=0.040))  # +22.5% FVD
    assert rc == 1 and rep["pass"] is False
    assert rep["gate_dpmpp5"]["pass"] is False
    assert rep["gate_dpmpp4"]["pass"] is False


def test_gate_mse_regression_alone_fails(tmp_path):
    rc, rep = _gate(tmp_path, _arms(fvd5=4.4, mse5=0.050,   # FVD better,
                                    fvd4=4.4, mse4=0.040))  # MSE +25%
    assert rc == 1
    assert rep["gate_dpmpp5"]["pass"] is False
    assert rep["gate_dpmpp4"]["pass"] is True
