"""Tensor-parallel parameter sharding over the mesh 'model' axis.

The model is small enough that pure data parallelism is the right default
(SURVEY.md §2.6), but the framework supports sharding the denoiser's weight
matrices across chips for larger configurations: each 2D Dense kernel whose
output dim divides the 'model' axis is sharded on that dim (column-parallel),
its bias alike; everything else stays replicated.  No model code changes —
GSPMD propagates the shardings through the jitted train step and inserts the
reduce-scatter/all-gather collectives over ICI.

Usage:
    shardings = param_shardings(params, mesh, min_size=1 << 14)
    params = jax.device_put(params, shardings)
    # jit infers from input shardings; donated state keeps them
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_shardings(params: Any, mesh: Mesh, min_size: int = 1 << 14) -> Any:
    """NamedSharding pytree for the params: large 2D kernels column-sharded
    over 'model', everything else replicated."""
    n_model = mesh.shape.get("model", 1)
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, "model"))

    def leaf_sharding(x):
        if (
            n_model > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.size >= min_size
            and x.shape[-1] % n_model == 0
        ):
            return col
        return rep

    return jax.tree.map(leaf_sharding, params)


def shard_params(params: Any, mesh: Mesh, min_size: int = 1 << 14) -> Any:
    """Place the params on the mesh with tensor-parallel shardings."""
    return jax.device_put(params, param_shardings(params, mesh, min_size))
