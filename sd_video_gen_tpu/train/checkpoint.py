"""Orbax checkpointing: params + optimizer state + step, reference-style naming.

The reference saved only ``model.state_dict()`` per epoch (trainers/
trainer.py:469-480), so resume restarted Adam moments. Here the full
TrainState (params, opt state, step) is checkpointed; names keep the
reference scheme ``<config>_<index>_<mode>`` with ``<index>`` = count of
existing checkpoints matching the config name (trainers/trainer.py:43),
so prediction CLIs can address checkpoints identically.

Format versioning: every save stamps ``sdvg_format.json`` with the schema
version. v1 (pre-stamp) checkpoints predate the transformer's final stack
norms (enc_norm/dec_norm, the torch nn.Transformer encoder.norm/decoder.norm
parity fix) — ``restore_checkpoint`` migrates them by initializing the
missing LayerNorms to scale=1/bias=0 and fresh (zero) Adam moments, with a
loud warning: the v1 architecture applied NO final norm, so the migrated
forward is approximate, not bit-equal to what the old checkpoint produced.
"""

from __future__ import annotations

import json
import os
import warnings

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

FORMAT_VERSION = 2
_FORMAT_FILE = "sdvg_format.json"
# params added in v2 that v1 checkpoints lack
_V2_NEW_PARAMS = ("enc_norm", "dec_norm")


def checkpoint_index(checkpoint_dir: str, config_name: str) -> int:
    """Reference semantics: count existing entries containing the config name."""
    if not os.path.isdir(checkpoint_dir):
        return 0
    return len([n for n in os.listdir(checkpoint_dir) if config_name in n])


def checkpoint_path(checkpoint_dir: str, config_name: str, index: int,
                    mode: str) -> str:
    name = f"{config_name}_{index}_{mode}"
    return os.path.abspath(os.path.join(checkpoint_dir, name))


# -- async save machinery -----------------------------------------------------
#
# A flagship TrainState save moves ~5GB (params + Adam state); synchronous
# epoch-granular saving stalls the train loop for the full disk write. The
# shared AsyncCheckpointer copies device arrays to host, returns, and
# serializes in background threads — the loop overlaps the write with the
# next epochs. Sequencing: AsyncCheckpointer.save() itself blocks until any
# PREVIOUS save has committed, so by the time a new save starts, every
# pending path is durable and gets its version stamp then. finalize_saves()
# drains everything (fit end, interrupt, restore, process exit).

_ASYNC_CKPTR = None
_PENDING_STAMPS: list = []


def _async_ckptr():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        import atexit
        atexit.register(finalize_saves)
    return _ASYNC_CKPTR


def _stamp(path: str) -> None:
    if jax.process_index() == 0:  # multihost: one stamp writer
        with open(os.path.join(path, _FORMAT_FILE), "w") as f:
            json.dump({"format_version": FORMAT_VERSION}, f)


def _stamp_pending() -> None:
    for p in _PENDING_STAMPS:
        _stamp(p)
    _PENDING_STAMPS.clear()


def finalize_saves() -> None:
    """Block until every in-flight async save has committed, then stamp."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    _stamp_pending()


def save_checkpoint(path: str, state, block: bool = True) -> None:
    """Save the full TrainState at ``path`` and stamp the format version.

    ``block=False`` returns as soon as device arrays are copied to host and
    lets the serialization run in background threads; callers must ensure
    ``finalize_saves()`` runs before the checkpoint is read (restore and the
    Trainer's fit/interrupt paths do).
    """
    path = os.path.abspath(path)
    ckptr = _async_ckptr()
    # a re-save of a path still pending would stamp a half-written dir;
    # the new save's own commit will stamp it instead
    if path in _PENDING_STAMPS:
        _PENDING_STAMPS.remove(path)
    ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
    _stamp_pending()  # everything before this save is committed now
    _PENDING_STAMPS.append(path)
    if block:
        finalize_saves()


def read_format_version(path: str) -> int:
    """Stamped version; 1 for pre-versioning checkpoints (no stamp file)."""
    p = os.path.join(os.path.abspath(path), _FORMAT_FILE)
    if not os.path.exists(p):
        return 1
    with open(p) as f:
        return int(json.load(f).get("format_version", 1))


def restore_checkpoint(path: str, abstract_state):
    """Restore into the structure of ``abstract_state`` (use jax.eval_shape).

    Older-format checkpoints are migrated forward (see module docstring);
    an unstamped checkpoint that already matches the current structure
    (saved by early v2 builds) restores normally.
    """
    finalize_saves()  # never read a checkpoint whose save is in flight
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no checkpoint directory at {path}")
    if read_format_version(path) >= FORMAT_VERSION:
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path, abstract_state)
    # unstamped: try the current structure first, then the v1 migration.
    # If the v1-shaped restore ALSO fails, the checkpoint was never a v1
    # tree (wrong --config, corruption, ...) — surface the ORIGINAL error
    # rather than a misleading 'migrating v1' story.
    try:
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path, abstract_state)
    except Exception as current_err:
        try:
            return _restore_v1(path, abstract_state)
        except Exception:
            raise current_err


def abstract_like(state):
    return jax.tree.map(ocp.utils.to_shape_dtype_struct, state)


# -- v1 -> v2 migration ------------------------------------------------------

def _strip(tree, names=_V2_NEW_PARAMS):
    """Remove dict keys in ``names`` anywhere in a pytree of dicts /
    (named)tuples / lists (covers TrainState fields and optax states)."""
    if isinstance(tree, dict):
        return {k: _strip(v, names) for k, v in tree.items() if k not in names}
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # NamedTuple
        return type(tree)(*(_strip(v, names) for v in tree))
    if isinstance(tree, (list, tuple)):
        return type(tree)(_strip(v, names) for v in tree)
    return tree


def _init_subtree(abstract_sub, ones_for_scale: bool):
    """Fresh values for a subtree absent from the checkpoint: LayerNorm
    identity in params (scale=1, bias=0), zero Adam moments elsewhere."""
    def leaf(pathkeys, a):
        name = getattr(pathkeys[-1], "key", "") if pathkeys else ""
        fn = jnp.ones if (ones_for_scale and name == "scale") else jnp.zeros
        return fn(a.shape, a.dtype)
    return jax.tree_util.tree_map_with_path(leaf, abstract_sub)


def _fill(restored, abstract, in_params: bool, names=_V2_NEW_PARAMS):
    """Walk ``abstract``; take values from ``restored`` where present and
    freshly initialize the ``names`` subtrees the v1 checkpoint lacked."""
    if isinstance(abstract, dict):
        out = {}
        for k, v in abstract.items():
            if k in names and (not isinstance(restored, dict)
                               or k not in restored):
                out[k] = _init_subtree(v, ones_for_scale=in_params)
            else:
                out[k] = _fill(restored[k], v, in_params, names)
        return out
    if isinstance(abstract, tuple) and hasattr(abstract, "_fields"):
        return type(abstract)(*(_fill(r, a, in_params, names)
                                for r, a in zip(restored, abstract)))
    if isinstance(abstract, (list, tuple)):
        return type(abstract)(_fill(r, a, in_params, names)
                              for r, a in zip(restored, abstract))
    return restored


def _restore_v1(path: str, abstract_state):
    """Restore a pre-versioning TrainState checkpoint missing the final
    stack norms; fill them with identity LN + fresh moments."""
    old_abstract = abstract_state.replace(
        params=_strip(abstract_state.params),
        opt_state=_strip(abstract_state.opt_state))
    with ocp.StandardCheckpointer() as ckptr:
        old = ckptr.restore(path, old_abstract)
    # warn only once the v1-shaped restore actually succeeded — a failure
    # here means the checkpoint was never v1 and the caller surfaces the
    # original current-structure error instead
    warnings.warn(
        f"checkpoint {path} is format v1 (predates the transformer's final "
        "stack norms): migrating by initializing enc_norm/dec_norm to "
        "scale=1/bias=0 with fresh Adam moments. The v1 architecture applied "
        "no final LayerNorm, so the migrated forward is approximate — "
        "fine-tune or re-convert from a reference .pt for exactness.",
        stacklevel=2)
    return abstract_state.replace(
        step=old.step,
        params=_fill(old.params, abstract_state.params, in_params=True),
        opt_state=_fill(old.opt_state, abstract_state.opt_state,
                        in_params=False))
