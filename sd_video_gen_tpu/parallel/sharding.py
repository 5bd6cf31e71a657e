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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over the data axis; rest replicated."""
    return NamedSharding(mesh, P(AXIS_DATA))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
