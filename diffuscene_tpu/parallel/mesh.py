"""Device mesh + sharding helpers — the framework's communication layer.

The reference has no distributed backend at all (SURVEY.md §2.6: dead
`torch.distributed` imports, single `cuda:0`).  On TPU, scaling is first-class:
we define a (data, model) mesh over ICI, shard batches over `data`, keep (or
shard) parameters over `model`, and let XLA insert the gradient psums.  All
collective communication is implicit via pjit/NamedSharding.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a 2D ('data', 'model') mesh.

    ``n_data`` defaults to n_devices // n_model.  With a single device this
    degenerates gracefully (1x1 mesh) so all code paths are mesh-agnostic.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Device-put a host batch with the leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
