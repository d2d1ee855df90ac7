"""Orbax checkpointing with the reference's model_{epoch:05d} discovery.

TPU-native equivalent of `scripts/training_utils.py:62-97`: checkpoints are
written to ``<experiment_dir>/model_{epoch:05d}`` and resume scans the
directory for the highest epoch.  The whole TrainState pytree (params +
optimizer state + step + batch_stats for the AE) goes into one orbax
StandardCheckpointer save, so optimizer momenta survive restarts.

Dataset-coupled state (normalization bounds) is persisted separately as
``bounds.npz`` exactly like the reference (`train_diffusion.py:128-137`), so
samplers can load the same stats.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^model_(\d+)$")


def _ckpt_path(experiment_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(experiment_dir), f"model_{epoch:05d}")


def latest_epoch(experiment_dir: str) -> Optional[int]:
    """Highest epoch with a saved checkpoint, or None.  (training_utils.py:62-75)"""
    if not os.path.isdir(experiment_dir):
        return None
    ids = [
        int(m.group(1))
        for f in os.listdir(experiment_dir)
        if (m := _CKPT_RE.match(f)) and os.path.isdir(os.path.join(experiment_dir, f))
    ]
    return max(ids) if ids else None


_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def save_checkpoint(state: Any, experiment_dir: str, epoch: int,
                    blocking: bool = True, keep_last: Optional[int] = None) -> str:
    """Save the full train-state pytree to model_{epoch:05d}.

    ``blocking=False`` hands the serialized arrays to an orbax
    AsyncCheckpointer background thread and returns immediately, so the
    train loop overlaps checkpoint I/O with compute (the arrays are copied
    to host before returning — mutating/donating the state afterwards is
    safe).  ``keep_last=N`` deletes all but the N highest-epoch checkpoints
    after a successful save (the reference keeps every epoch,
    training_utils.py:77-97; at production checkpoint cadence that is a
    disk-usage bug, so retention is opt-in here).
    """
    global _ASYNC_CKPTR
    path = _ckpt_path(experiment_dir, epoch)
    if blocking:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
    else:
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        # serialize any previous in-flight save first: orbax rejects
        # overlapping saves on one checkpointer
        _ASYNC_CKPTR.wait_until_finished()
        # snapshot to host COPIES before returning: the caller's next
        # train_step donates these buffers, and on the CPU backend a
        # zero-copy view would be overwritten mid-write
        snapshot = jax.tree.map(
            lambda a: np.array(a) if hasattr(a, "dtype") else a, state)
        _ASYNC_CKPTR.save(path, args=ocp.args.StandardSave(snapshot), force=True)
    if keep_last is not None and keep_last > 0:
        prune_checkpoints(experiment_dir, keep_last, protect=epoch)
    return path


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save has committed (call before
    process exit and before restoring in the same process)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def prune_checkpoints(experiment_dir: str, keep_last: int,
                      protect: Optional[int] = None) -> list:
    """Delete all but the ``keep_last`` highest-epoch checkpoints.

    ``protect`` (an epoch) is never deleted even if it falls outside the
    window (e.g. the save that is still being written asynchronously).
    Returns the list of removed epochs."""
    import shutil

    if not os.path.isdir(experiment_dir):
        return []
    ids = sorted(
        int(m.group(1))
        for f in os.listdir(experiment_dir)
        if (m := _CKPT_RE.match(f)) and os.path.isdir(os.path.join(experiment_dir, f))
    )
    doomed = [e for e in ids[:-keep_last] if e != protect] if keep_last < len(ids) else []
    for e in doomed:
        shutil.rmtree(_ckpt_path(experiment_dir, e), ignore_errors=True)
    return doomed


def load_checkpoint(state_template: Any, experiment_dir: str,
                    epoch: Optional[int] = None) -> Tuple[Any, Optional[int]]:
    """Restore the latest (or given-epoch) checkpoint into the template's
    structure/shardings.  Returns (state, epoch) — (template, None) if no
    checkpoint exists, mirroring the reference's silent no-op resume."""
    if epoch is None:
        epoch = latest_epoch(experiment_dir)
    if epoch is None:
        return state_template, None
    path = _ckpt_path(experiment_dir, epoch)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
    state = ckptr.restore(path, abstract)
    return state, epoch


def save_bounds(experiment_dir: str, bounds: Dict[str, np.ndarray]):
    """Persist normalization bounds next to checkpoints (train_diffusion.py:128-137)."""
    os.makedirs(experiment_dir, exist_ok=True)
    np.savez(os.path.join(experiment_dir, "bounds.npz"), **bounds)


def load_bounds(experiment_dir: str) -> Optional[Dict[str, np.ndarray]]:
    p = os.path.join(experiment_dir, "bounds.npz")
    if not os.path.isfile(p):
        return None
    with np.load(p) as d:
        return {k: d[k] for k in d.files}
