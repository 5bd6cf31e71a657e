"""Sharding rules: map parameter pytree paths to NamedShardings.

Megatron-style tensor parallelism for the frame transformer, expressed purely
as sharding annotations (XLA/GSPMD inserts the collectives):

  - fused QKV / FFN-lin1 kernels: output features sharded over ``model``
    (column parallel — each device owns a head/hidden slice)
  - attention out-proj / FFN-lin2 kernels: input features sharded over
    ``model`` (row parallel — XLA emits one all-reduce back onto the
    replicated residual stream)
  - everything else (embeddings, norms, biases, head): replicated
  - batches: leading axis sharded over ``data``

Rules are applied by path-name matching over the pytree, so models need no
in-line partitioning annotations.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sd_video_gen_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL

# (path-substring, param-name, ndim) -> PartitionSpec factory
# Dense kernels are (in_features, out_features).
_COL_PARALLEL = ("qkv", "lin1", "q", "k", "v")   # shard out dim
_ROW_PARALLEL = ("out", "lin2")                  # shard in dim (attn out-proj / ffn lin2)


def _spec_for(path: tuple[str, ...], leaf) -> P:
    names = [p for p in path]
    if getattr(leaf, "ndim", 0) != 2:
        return P()  # biases, norms, tables: replicated
    parent = names[-2] if len(names) >= 2 else ""
    name = names[-1]
    if name != "kernel":
        return P()
    # final output head ('out' at top level) stays replicated; attention
    # out-proj ('out' nested under *_attn) is row-parallel.
    in_attn = any("attn" in n for n in names)
    in_ffn = any(n == "ffn" for n in names)
    if parent in _COL_PARALLEL and (in_attn or in_ffn or parent in ("qkv",)):
        return P(None, AXIS_MODEL)
    if parent in _ROW_PARALLEL and (in_attn or in_ffn):
        return P(AXIS_MODEL, None)
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree matching ``params`` (tensor-parallel rules above)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def one(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        return NamedSharding(mesh, _spec_for(keys, leaf))

    leaves = [one(p, l) for p, l in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


# -- UNet / VAE (diffusion) tensor parallelism --------------------------------
#
# Megatron pairing inside every residual / attention / FFN block: the FIRST
# matmul-ish op is column-parallel (OUT features over ``model``), the SECOND
# row-parallel (IN features over ``model``), so GSPMD emits exactly one
# all-reduce per block back onto the replicated residual stream. Conv kernels
# are flax HWIO — column = shard axis 3, row = shard axis 2.
#
#   ResnetBlock:  conv1 (col) -> GN/SiLU (shard-aligned: out_ch/axis keeps
#                 whole GroupNorm groups per shard) -> conv2 (row);
#                 time_emb_proj col-parallel to match conv1's layout;
#                 conv_shortcut stays replicated (adds to the residual).
#   Attention:    to_q/to_k/to_v (col: heads split across devices) ->
#                 to_out_0 (row). VAE single-head: query/key/value ->
#                 proj_attn.
#   GEGLU FFN:    geglu_proj_h / geglu_proj_gate (both col — split denses
#                 keep the h|gate halves shard-aligned) -> out_proj (row).
#   TimeEmbedding linear_1 (col) -> linear_2 (row).
#
# NB: GSPMD cannot auto-partition a pallas_call, so plain jit would force the
# einsum attention under these rules. ops/attention.head_sharded_attention
# closes that gap: activate the context around the jitted program and
# self-attention partitions itself over ``model`` with shard_map (heads are
# the TP unit — to_q/to_k/to_v are column-parallel), running the flash
# kernel per device where the measured dispatch says it pays
# (tests/test_diffusion_sharding.py, tools/bench_mesh_denoise.py).

_DIFF_COL = ("conv1", "to_q", "to_k", "to_v", "geglu_proj_h",
             "geglu_proj_gate", "time_emb_proj", "query", "key", "value",
             "linear_1")
_DIFF_ROW = ("conv2", "to_out_0", "out_proj", "proj_attn", "linear_2")


def _diffusion_spec(path: tuple[str, ...], leaf, axis_size: int) -> P:
    if not path or path[-1] != "kernel":
        return P()  # biases / norms: replicated
    parent = path[-2] if len(path) >= 2 else ""
    nd = getattr(leaf, "ndim", 0)
    if nd not in (2, 4):
        return P()
    out_dim, in_dim = leaf.shape[-1], leaf.shape[-2]
    none_pre = (None,) * (nd - 2)
    if parent in _DIFF_COL and out_dim % axis_size == 0:
        return P(*none_pre, None, AXIS_MODEL)
    if parent in _DIFF_ROW and in_dim % axis_size == 0:
        return P(*none_pre, AXIS_MODEL, None)
    return P()


def diffusion_param_shardings(mesh: Mesh, params):
    """Tensor-parallel NamedShardings for UNet2DCondition / AutoencoderKL
    param trees (rules above); kernels whose feature dim does not divide the
    ``model`` axis stay replicated."""
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[AXIS_MODEL]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def one(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "name", str(k)))
                     for k in path)
        return NamedSharding(mesh, _diffusion_spec(keys, leaf, axis_size))

    leaves = [one(p, l) for p, l in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over the data axis; rest replicated."""
    return NamedSharding(mesh, P(AXIS_DATA))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
