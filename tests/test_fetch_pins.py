"""fetch_artifacts: hard hash pins over a mocked resolver (VERDICT r4 #8).

The build environment has zero egress, so the real fetch path can never run
here; these tests drive tools/real_weight_parity.fetch_artifacts through a
mock resolver and pin file to prove the contract:
  - resolved + matching pin  -> path returned
  - resolved + WRONG pin     -> hard RuntimeError (supply-chain guard)
  - resolved + null pin      -> hard error unless record_pins (bootstrap),
                                which writes the hash back to the pin file
  - unresolved (offline)     -> silently absent => stages report SKIPPED
No jax, no network, no backend.
"""

import hashlib
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.real_weight_parity import fetch_artifacts  # noqa: E402


@pytest.fixture()
def pinned(tmp_path):
    blob = tmp_path / "weights.bin"
    blob.write_bytes(b"not really a vae" * 100)
    digest = hashlib.sha256(blob.read_bytes()).hexdigest()
    pins = tmp_path / "pins.json"

    def write(sha):
        pins.write_text(json.dumps({
            "vae": {"repo": "org/sd", "filename": "vae/model.bin",
                    "revision": "main", "sha256": sha},
            "i3d": {"repo": None, "filename": "i3d.pt",
                    "url_env": "SDVG_TEST_I3D_URL", "sha256": None},
        }))
        return str(pins)

    return str(blob), digest, write


def test_matching_pin_returns_path(pinned):
    blob, digest, write = pinned
    calls = []

    def resolver(repo, filename, revision):
        calls.append((repo, filename, revision))
        return blob

    out = fetch_artifacts(["vae"], resolver=resolver, pins_path=write(digest))
    assert out == {"vae": blob}
    assert calls == [("org/sd", "vae/model.bin", "main")]


def test_hash_mismatch_is_fatal(pinned):
    blob, _, write = pinned
    with pytest.raises(RuntimeError, match="hash mismatch"):
        fetch_artifacts(["vae"], resolver=lambda *a: blob,
                        pins_path=write("0" * 64))


def test_null_pin_requires_record_bootstrap(pinned):
    blob, digest, write = pinned
    pins_path = write(None)
    with pytest.raises(RuntimeError, match="unpopulated"):
        fetch_artifacts(["vae"], resolver=lambda *a: blob,
                        pins_path=pins_path)
    # the documented bootstrap: record, then the pin is enforced
    out = fetch_artifacts(["vae"], resolver=lambda *a: blob,
                          pins_path=pins_path, record_pins=True)
    assert out == {"vae": blob}
    assert json.load(open(pins_path))["vae"]["sha256"] == digest
    # recorded pin now enforces: a different blob fails
    other = os.path.join(os.path.dirname(blob), "other.bin")
    open(other, "wb").write(b"tampered")
    with pytest.raises(RuntimeError, match="hash mismatch"):
        fetch_artifacts(["vae"], resolver=lambda *a: other,
                        pins_path=pins_path)


def test_offline_resolver_skips_gracefully(pinned):
    blob, digest, write = pinned
    out = fetch_artifacts(["vae"], resolver=lambda *a: None,
                          pins_path=write(digest))
    assert out == {}


def test_urlless_artifact_skips_without_env(pinned, monkeypatch):
    blob, digest, write = pinned
    monkeypatch.delenv("SDVG_TEST_I3D_URL", raising=False)
    out = fetch_artifacts(["i3d"], resolver=lambda *a: blob,
                          pins_path=write(digest))
    assert out == {}
    # with the env URL set it resolves through the same pin machinery
    monkeypatch.setenv("SDVG_TEST_I3D_URL", "https://example.test/i3d.pt")
    out = fetch_artifacts(["i3d"], resolver=lambda *a: blob,
                          pins_path=write(digest), record_pins=True)
    assert out == {"i3d": blob}


def test_shipped_pins_file_parses():
    import tools.real_weight_parity as rwp
    pins = json.load(open(rwp.PINS_PATH))
    for name in ("vae", "unet", "clip", "i3d"):
        assert name in pins and "filename" in pins[name]
