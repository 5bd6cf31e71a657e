"""TF-Hub I3D checkpoint -> JAX params converter.

Reference: models/convert_tf_pretrained.py — remaps TF-slim variable names
(``RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w``) to the torch module layout and
permutes kernels. Here the target is models/i3d.py's param tree directly; TF
kernels are already (kt, kh, kw, in, out) so no transpose is needed, and TF
``batch_norm`` beta/moving stats map onto the folded-BN affine (TF I3D uses no
gamma — scale is fixed at 1).

Gated on a TF checkpoint reader being available (tensorflow is not in this
image); the name-mapping logic is pure and unit-tested.
"""

from __future__ import annotations

import numpy as np

from sd_video_gen_tpu.models.i3d import _MIXED

_TF_BRANCH = {
    "b0": "Branch_0/Conv3d_0a_1x1",
    "b1a": "Branch_1/Conv3d_0a_1x1",
    "b1b": "Branch_1/Conv3d_0b_3x3",
    "b2a": "Branch_2/Conv3d_0a_1x1",
    "b2b": "Branch_2/Conv3d_0b_3x3",
    "b3b": "Branch_3/Conv3d_0b_1x1",
}


def tf_var_map() -> dict[str, tuple[str, ...]]:
    """our param path -> TF variable name, for every I3D parameter."""
    out: dict[str, tuple[str, ...]] = {}

    def unit(ours: str, tf: str, with_bn=True, with_bias=False):
        base = f"RGB/inception_i3d/{tf}"
        out[f"{ours}/conv3d/kernel"] = (f"{base}/conv_3d/w",)
        if with_bias:
            out[f"{ours}/conv3d/bias"] = (f"{base}/conv_3d/b",)
        if with_bn:
            out[f"{ours}/bn_bias"] = (f"{base}/batch_norm/beta",)
            out[f"{ours}/bn_mean"] = (f"{base}/batch_norm/moving_mean",)
            out[f"{ours}/bn_var"] = (f"{base}/batch_norm/moving_variance",)
            out[f"{ours}/bn_scale"] = ("__ones__",)  # TF I3D: no gamma

    unit("Conv3d_1a_7x7", "Conv3d_1a_7x7")
    unit("Conv3d_2b_1x1", "Conv3d_2b_1x1")
    unit("Conv3d_2c_3x3", "Conv3d_2c_3x3")
    for name, _ in _MIXED:
        for b, tf_b in _TF_BRANCH.items():
            unit(f"{name}/{b}", f"{name}/{tf_b}")
    unit("logits", "Logits/Conv3d_0c_1x1", with_bn=False, with_bias=True)
    return out


def convert_tf_i3d(tf_reader) -> dict:
    """tf_reader: object with get_tensor(name) (e.g. a TF CheckpointReader)."""
    mapping = tf_var_map()
    params: dict = {}
    for path, (tf_name,) in mapping.items():
        parts = path.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if tf_name == "__ones__":
            ref = tf_reader.get_tensor(
                mapping[path.replace("bn_scale", "bn_bias")][0])
            node[parts[-1]] = np.ones_like(np.squeeze(np.asarray(ref)))
        else:
            t = np.asarray(tf_reader.get_tensor(tf_name))
            if parts[-1] in ("bias",) or parts[-1].startswith("bn_"):
                t = np.squeeze(t)
            node[parts[-1]] = t
    return {"params": params}


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--tf_checkpoint", required=True)
    p.add_argument("--out", default="i3d_params.npz")
    args = p.parse_args(argv)
    try:
        from tensorflow.python.training import py_checkpoint_reader
        reader = py_checkpoint_reader.NewCheckpointReader(args.tf_checkpoint)
    except ImportError as e:
        raise SystemExit(f"tensorflow not available in this image: {e}")
    params = convert_tf_i3d(reader)
    import jax
    flat = {"/".join(map(str, k)): v for k, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(args.out, **{k: np.asarray(v) for k, v in flat.items()})
    print(f"saved {len(flat)} tensors to {args.out}")


if __name__ == "__main__":
    main()
