"""Checkpoint save/restore for params + optimizer state + step.

The reference checkpoints with ``tf.train.Saver(model.vars)`` every epoch
(train.py:95,164-166) but loses the Adam beta-power accumulators and global
step on resume. Here the *entire* TrainState pytree (params, full Adam
state, step) round-trips via flax msgpack serialization, so resume
continues the LR schedule exactly.

File format: a single msgpack file. `save_params`/`load_params` handle
params-only checkpoints for inference/distribution.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
from flax import serialization

__all__ = [
    "save_checkpoint",
    "save_checkpoint_orbax",
    "restore_checkpoint_orbax",
    "restore_checkpoint",
    "restore_checkpoint_auto",
    "save_params",
    "load_params",
    "latest_checkpoint",
]


def _to_host(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_get(x) if hasattr(x, "device") else x, tree
    )


def save_checkpoint(path: str | os.PathLike, state) -> str:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = serialization.to_bytes(_to_host(state))
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)  # atomic: no torn checkpoints on preemption
    return str(path)


def restore_checkpoint(path: str | os.PathLike, state_template):
    """Restore into a pytree of the same structure (e.g. a fresh state)."""
    data = Path(path).read_bytes()
    return serialization.from_bytes(state_template, data)


def restore_checkpoint_auto(path: str | os.PathLike, state_template):
    """Restore a TrainState from either backend, detected by path type:
    a directory is an orbax checkpoint, a file is msgpack."""
    if Path(path).is_dir():
        return restore_checkpoint_orbax(path, state_template)
    return restore_checkpoint(path, state_template)


def save_params(path: str | os.PathLike, params) -> str:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(_to_host(params)))
    return str(path)


def load_params(path: str | os.PathLike, params_template):
    """Load params from a params-only OR full-TrainState checkpoint.

    Full-state files (saved per-epoch by the Trainer) keep params under a
    'params' key next to 'step'/'opt_state'; detect and unwrap. Orbax
    checkpoint directories are handled transparently.
    """
    if Path(path).is_dir():
        ckptr = _orbax_checkpointer()
        ckptr.wait_until_finished()  # never read a half-written save
        raw = ckptr.restore(Path(path).absolute())
    else:
        raw = serialization.msgpack_restore(Path(path).read_bytes())
    if (
        isinstance(raw, dict)
        and "params" in raw
        and ("opt_state" in raw or "step" in raw)
    ):
        raw = raw["params"]
    return serialization.from_state_dict(params_template, raw)


def latest_checkpoint(directory: str | os.PathLike, prefix: str = "model_"):
    """Highest-numbered ``<prefix><n>.msgpack`` in a directory, or None."""
    directory = Path(directory)
    if not directory.is_dir():
        return None
    best, best_n = None, -1
    for p in directory.glob(f"{prefix}*.msgpack"):
        try:
            n = int(p.stem[len(prefix):])
        except ValueError:
            continue
        if n > best_n:
            best, best_n = p, n
    return str(best) if best else None


# ----------------------------------------------------- orbax backend
_ORBAX_CKPTR = None


def _orbax_checkpointer():
    """Process-wide StandardCheckpointer, reused so asynchronous saves
    can be awaited later (`wait_for_orbax_saves`)."""
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp

        _ORBAX_CKPTR = ocp.StandardCheckpointer()
    return _ORBAX_CKPTR


def save_checkpoint_orbax(
    directory: str | os.PathLike, state, wait: bool = True
) -> str:
    """Save a TrainState as an orbax checkpoint directory.

    Orbax writes tensors sharded — preferable to the single-file msgpack
    backend for very large states or multi-host runs. An existing
    directory is overwritten (preemption saves may repeat).

    ``wait=False`` makes the save truly asynchronous: only the
    device->host fetch happens inline (the state pytree is immutable, so
    training can continue immediately); the file write runs on orbax's
    background thread. Call `wait_for_orbax_saves()` before process exit
    or before reading the checkpoint back. A still-running previous save
    is awaited first (orbax allows one in-flight save per checkpointer).
    """
    directory = Path(directory).absolute()
    ckptr = _orbax_checkpointer()
    ckptr.wait_until_finished()  # at most one save in flight
    ckptr.save(directory, _to_host(state), force=True)
    if wait:
        ckptr.wait_until_finished()
    return str(directory)


def wait_for_orbax_saves() -> None:
    """Block until any in-flight asynchronous orbax save has committed."""
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()


def restore_checkpoint_orbax(directory: str | os.PathLike, state_template):
    ckptr = _orbax_checkpointer()
    ckptr.wait_until_finished()  # never read a half-written save
    restored = ckptr.restore(Path(directory).absolute(), state_template)
    # Orbax returns jax.Arrays committed to device 0; hand back host
    # arrays so the jitted train step is free to (re)place them with the
    # mesh sharding of the incoming batches (a device-0-committed state
    # conflicts with sharded inputs and fails jit's device check).
    return _to_host(restored)
