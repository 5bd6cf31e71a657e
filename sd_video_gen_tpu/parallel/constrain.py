"""Activation sharding constraints for the tensor-parallel diffusion path.

``diffusion_param_shardings`` (parallel/sharding.py) shards the UNet/VAE
weights Megatron-style, but GSPMD still has to PROPAGATE shardings through
the activations — and at the head-split reshapes in cross-attention and the
time-embedding broadcast in the resnet blocks it gives up and replicates
("involuntary full rematerialization", spmd_partitioner.cc). On real chips
that bounce costs an all-gather per block.

``tp_constrain`` pins the activation sharding explicitly at those points.
It keys off the SAME trace-time context as the head-sharded attention
(ops/attention.head_sharded_attention): outside a TP context, or when the
annotated dim does not divide the mesh's model axis, it is an exact no-op —
single-device programs and tests compile byte-identical graphs.

Reference counterpart: the torch code runs the UNet denoise loop on one GPU
(/root/reference/utils/sd_utils.py:97-126,222-267); this module is part of
what makes the SAME loop run model-parallel over a TPU mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def tp_constrain(x, dim: int):
    """Constrain ``x`` to be sharded over the active TP mesh axis on ``dim``.

    No-op when no ``head_sharded_attention`` context is active, the axis
    size is 1, or ``x.shape[dim] % axis_size != 0`` (the same divisibility
    rule ``diffusion_param_shardings`` applies to the weights, so the
    activation constraints always agree with the weight layout).
    """
    from sd_video_gen_tpu.ops.attention import _TP_CTX
    if not _TP_CTX:
        return x
    mesh, axis, _ = _TP_CTX[-1]
    size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)
    if size <= 1:
        return x
    dim = dim % x.ndim
    if x.shape[dim] % size != 0:
        return x
    # UNCONSTRAINED on the other dims: P(None, ..., axis) would FORCE them
    # replicated, which under a DP x TP mesh would all-gather a
    # data-sharded batch axis at every constraint. Only the target dim's
    # placement is pinned; GSPMD keeps propagating the rest.
    spec = [P.UNCONSTRAINED] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
