"""K-nearest-neighbor indices over point clouds — XLA top_k formulation.

Equivalent of the reference graph-encoder `knn`
(`scene_synthesis/networks/foldingnet_autoencoder.py:59-76`): for (B, N, D)
points, return the indices (B, N, k) of the k nearest points (self included,
since self-distance 0 always wins — same semantics as the torch topk over
negative distances).

The pairwise matrix is formed as -(||x||^2 + ||y||^2 - 2 x.yT) so the inner
product rides the MXU; `jax.lax.top_k` handles the selection.  For the
reference workload (N=2048, k=16) the (N, N) matrix is 16 MB/sample in f32 —
comfortably HBM-resident and XLA fuses the norms into the matmul epilogue.
``chunk`` bounds peak memory for larger N by sweeping query rows.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def knn_indices(x: jnp.ndarray, k: int, chunk: Optional[int] = None) -> jnp.ndarray:
    """(B, N, D) -> (B, N, k) int32 indices of the k nearest neighbors."""
    B, N, D = x.shape
    xx = jnp.sum(x * x, axis=-1)  # (B, N)

    def neighbors(q, qq):
        # q: (B, C, D), qq: (B, C) -> (B, C, k)
        sim = 2.0 * jnp.einsum("bcd,bnd->bcn", q, x) - qq[..., None] - xx[:, None, :]
        _, idx = jax.lax.top_k(sim, k)
        return idx.astype(jnp.int32)

    if chunk is None or chunk >= N:
        return neighbors(x, xx)

    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    qqp = jnp.pad(xx, ((0, 0), (0, pad)))
    xs = xp.reshape(B, n_chunks, chunk, D).transpose(1, 0, 2, 3)
    qs = qqp.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    idx = jax.lax.map(lambda args: neighbors(*args), (xs, qs))
    idx = idx.transpose(1, 0, 2, 3).reshape(B, n_chunks * chunk, k)
    return idx[:, :N]


def gather_neighbors(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features: (B, N, C), (B, S, k) -> (B, S, k, C).

    Equivalent of reference `index_points`
    (foldingnet_autoencoder.py:113-126).
    """
    return jax.vmap(lambda p, i: p[i])(points, idx)
