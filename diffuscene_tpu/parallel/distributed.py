"""Multi-host initialization + per-host data sharding.

The reference has no distributed backend at all (SURVEY.md §2.6/§5.8: dead
torch.distributed imports, single cuda:0).  On TPU pods this module is the
communication layer's entry point:

- `initialize()` wraps `jax.distributed.initialize` (no-op when single-host
  or already initialized) so every CLI can call it unconditionally.
- `host_local_slice(n)` / `shard_indices_for_host(indices)` split the global
  batch/dataset across hosts; each host feeds its local slice and
  `jax.make_array_from_process_local_data` (or plain device_put with a
  global NamedSharding) assembles the global array.  Gradient all-reduce
  stays implicit via pjit over the global mesh.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-host; returns
    (process_index, process_count).  Safe to call on a single host."""
    try:
        if coordinator_address is not None or num_processes not in (None, 1):
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except RuntimeError:
        pass  # already initialized
    return jax.process_index(), jax.process_count()


def host_local_slice(global_batch: int) -> slice:
    """This host's contiguous slice of a global batch."""
    per_host, rem = divmod(global_batch, jax.process_count())
    assert rem == 0, (global_batch, jax.process_count())
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def shard_indices_for_host(indices: np.ndarray) -> np.ndarray:
    """Round-robin dataset index shard for this host (drop the ragged tail
    so every host sees the same number of batches)."""
    p, n = jax.process_index(), jax.process_count()
    m = (len(indices) // n) * n
    return indices[:m][p::n]


def global_batch_from_host_local(local: np.ndarray, mesh, pspec=None):
    """Assemble a globally-sharded array from per-host local shards."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, pspec if pspec is not None else P("data"))
    return jax.make_array_from_process_local_data(sharding, local)
