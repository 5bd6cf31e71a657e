"""Offline FVD-from-files CLI (evaluation/compute_fvd_from_files role)."""

import numpy as np
import cv2
import pytest


def test_fvd_from_files(tmp_path, rng, monkeypatch):
    import sd_video_gen_tpu.evaluation.compute_fvd_from_files as mod

    for name in ("real", "fake"):
        d = tmp_path / name / "seq"
        d.mkdir(parents=True)
        for i in range(6):  # 2 sequences of seq_len 3
            img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
            cv2.imwrite(str(d / f"{i:03d}.png"), img)

    # stub the I3D features (real-I3D numerics covered elsewhere; CPU-slow)
    import jax.numpy as jnp

    def fake_load_i3d(path):
        class M:
            def apply(self, params, v):
                return jnp.mean(v, axis=(1, 2, 3))  # (B, 3) pseudo-features

        return M(), {}

    monkeypatch.setattr(mod, "load_i3d", fake_load_i3d)
    fvd = mod.main(["--real_dir", str(tmp_path / "real"),
                    "--fake_dir", str(tmp_path / "fake"),
                    "--seq_len", "3", "--size", "16", "--batch", "2"])
    assert np.isfinite(fvd)

    with pytest.raises(FileNotFoundError):
        mod.main(["--real_dir", str(tmp_path / "empty"),
                  "--fake_dir", str(tmp_path / "fake"), "--seq_len", "3"])
