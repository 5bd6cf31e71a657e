"""Orbax checkpointing: params + optimizer state + step, reference-style naming.

The reference saved only ``model.state_dict()`` per epoch (trainers/
trainer.py:469-480), so resume restarted Adam moments. Here the full
TrainState (params, opt state, step) is checkpointed; names keep the
reference scheme ``<config>_<index>_<mode>`` with ``<index>`` = count of
existing checkpoints matching the config name (trainers/trainer.py:43),
so prediction CLIs can address checkpoints identically.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def checkpoint_index(checkpoint_dir: str, config_name: str) -> int:
    """Reference semantics: count existing entries containing the config name."""
    if not os.path.isdir(checkpoint_dir):
        return 0
    return len([n for n in os.listdir(checkpoint_dir) if config_name in n])


def checkpoint_path(checkpoint_dir: str, config_name: str, index: int,
                    mode: str) -> str:
    name = f"{config_name}_{index}_{mode}"
    return os.path.abspath(os.path.join(checkpoint_dir, name))


def save_checkpoint(path: str, state) -> None:
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, abstract_state):
    """Restore into the structure of ``abstract_state`` (use jax.eval_shape)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), abstract_state)


def abstract_like(state):
    return jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
