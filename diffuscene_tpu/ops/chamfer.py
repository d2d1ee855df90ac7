"""Chamfer distance (2D/3D/5D/any-D) — Pallas TPU kernel + pure-jnp oracle.

TPU-native replacement for the reference CUDA extensions
(`ChamferDistancePytorch/chamfer3D/chamfer3D.cu:12-195`, plus the 2D/5D
variants).  The reference kernel computes, for two point clouds (B, N, D) and
(B, M, D), the bidirectional nearest-neighbor *squared* distances and argmin
indices; its backward kernel scatters gradients into both clouds via
atomicAdd (`chamfer3D.cu:155-174`).

Design here:
- forward: a Pallas kernel gridded over N-tiles (batch handled by a static
  in-kernel loop so output blocks satisfy the TPU (8, 128) block rule).
  Each program holds its x tiles and the full (padded) y cloud in VMEM and
  sweeps y in TILE_M chunks with an on-chip running (min, argmin).  The
  pairwise squared distances are formed as ||x||^2 + ||y||^2 - 2 x.yT so the
  inner product rides the MXU; D is zero-padded to the lane-friendly 8.
- backward: a custom VJP in plain JAX using the saved argmin indices —
  gather for the "own" cloud term and a scatter-add for the "other" cloud
  term, exactly mirroring the CUDA backward's double atomicAdd semantics.
- oracle: `chamfer_oracle` is the O(N*M) jnp reference (the equivalent of
  `ChamferDistancePytorch/chamfer_python.py:4-39`), used by the unit tests as
  the correctness oracle (same pattern as the reference `unit_test.py:14-35`).

On non-TPU backends (CPU tests) the kernel runs in Pallas interpreter mode.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # sentinel distance for padded y rows


# ---------------------------------------------------------------------------
# pure-jnp oracle (chamfer_python.py equivalent)
# ---------------------------------------------------------------------------

def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(B, N, D), (B, M, D) -> (B, N, M) squared euclidean distances."""
    xx = jnp.sum(x * x, axis=-1)[..., :, None]
    yy = jnp.sum(y * y, axis=-1)[..., None, :]
    xy = jnp.einsum("bnd,bmd->bnm", x, y)
    return xx + yy - 2.0 * xy


def chamfer_oracle(x: jnp.ndarray, y: jnp.ndarray):
    """Pure-jnp bidirectional chamfer (dist1, dist2, idx1, idx2)."""
    d = pairwise_sqdist(x, y)
    dist1 = jnp.min(d, axis=2)
    idx1 = jnp.argmin(d, axis=2).astype(jnp.int32)
    dist2 = jnp.min(d, axis=1)
    idx2 = jnp.argmin(d, axis=1).astype(jnp.int32)
    return dist1, dist2, idx1, idx2


# ---------------------------------------------------------------------------
# pallas kernel: directed nearest neighbor (x -> y)
# ---------------------------------------------------------------------------

def _nn_kernel(x_ref, y_ref, dist_ref, idx_ref, *, tile_m: int, m_real: int):
    """One x-tile program: nearest y for every x row of every batch element.

    x_ref: (B, TILE_N, Dp) VMEM     y_ref: (B, Mp, Dp) VMEM
    dist_ref: (B, TILE_N) out       idx_ref: (B, TILE_N) out (int32)

    The batch loop is a static Python range (B is a trace-time constant);
    the y sweep is a fori_loop over TILE_M chunks with an on-chip running
    (min, argmin).  Output blocks are (B, TILE_N) so the trailing two dims
    satisfy the TPU (8, 128) block-divisibility rule.
    """
    B = x_ref.shape[0]
    tile_n = x_ref.shape[1]
    mp = y_ref.shape[1]
    n_chunks = mp // tile_m

    for b in range(B):
        x = x_ref[b]  # (TILE_N, Dp)
        xx = jnp.sum(x * x, axis=-1, keepdims=True)  # (TILE_N, 1)

        def body(c, carry, b=b, x=x, xx=xx):
            best_d, best_i = carry
            yb = y_ref[b, pl.ds(c * tile_m, tile_m), :]  # (TILE_M, Dp)
            yy = jnp.sum(yb * yb, axis=-1)[None, :]  # (1, TILE_M)
            xy = jnp.dot(x, yb.T, preferred_element_type=jnp.float32)
            d = xx + yy - 2.0 * xy  # (TILE_N, TILE_M)
            # mask padded y rows so they never win the min
            col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + c * tile_m
            d = jnp.where(col < m_real, d, _BIG)
            chunk_d = jnp.min(d, axis=1)
            chunk_i = jnp.argmin(d, axis=1).astype(jnp.int32) + c * tile_m
            take = chunk_d < best_d
            return (
                jnp.where(take, chunk_d, best_d),
                jnp.where(take, chunk_i, best_i),
            )

        init = (
            jnp.full((tile_n,), _BIG, jnp.float32),
            jnp.zeros((tile_n,), jnp.int32),
        )
        best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
        dist_ref[b, :] = best_d
        idx_ref[b, :] = best_i


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _directed_nn(x: jnp.ndarray, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N, D) vs (B, M, D) -> nearest-neighbor (dist (B,N), idx (B,N))."""
    B, N, D = x.shape
    M = y.shape[1]
    TILE_N = min(_round_up(N, 8), 512)
    TILE_M = min(_round_up(M, 128), 1024)
    Np = _round_up(N, TILE_N)
    Mp = _round_up(M, TILE_M)
    Dp = max(_round_up(D, 8), 8)

    xp = jnp.zeros((B, Np, Dp), jnp.float32).at[:, :N, :D].set(x.astype(jnp.float32))
    yp = jnp.zeros((B, Mp, Dp), jnp.float32).at[:, :M, :D].set(y.astype(jnp.float32))

    kernel = functools.partial(_nn_kernel, tile_m=TILE_M, m_real=M)
    interpret = jax.default_backend() != "tpu"
    dist, idx = pl.pallas_call(
        kernel,
        grid=(Np // TILE_N,),
        in_specs=[
            pl.BlockSpec((B, TILE_N, Dp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Mp, Dp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, Np), jnp.int32),
        ],
        interpret=interpret,
    )(xp, yp)
    return dist[:, :N], idx[:, :N]


# ---------------------------------------------------------------------------
# public op with custom VJP (backward mirrors chamfer3D.cu:155-174)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray):
    """Bidirectional chamfer: (dist1 (B,N), dist2 (B,M), idx1, idx2).

    Squared distances, same contract as the reference autograd wrapper
    (`chamfer3D/dist_chamfer_3D.py:28-76`).  Differentiable w.r.t. both
    clouds through dist1 and dist2; idx outputs are non-differentiable.
    """
    dist1, idx1 = _directed_nn(x, y)
    dist2, idx2 = _directed_nn(y, x)
    return dist1, dist2, idx1, idx2


def _chamfer_fwd(x, y):
    out = chamfer_distance(x, y)
    dist1, dist2, idx1, idx2 = out
    return out, (x, y, idx1, idx2)


def _chamfer_bwd(res, g):
    x, y, idx1, idx2 = res
    g1, g2 = g[0], g[1]  # cotangents for dist1, dist2 (idx cotangents ignored)
    D = x.shape[-1]

    # dist1 term: d|x_n - y_{idx1[n]}|^2
    y_near = jnp.take_along_axis(y, idx1[..., None].repeat(D, axis=-1), axis=1)
    diff1 = 2.0 * (x - y_near) * g1[..., None]
    gx = diff1
    gy = jnp.zeros_like(y)
    gy = jax.vmap(lambda acc, i, v: acc.at[i].add(-v))(gy, idx1, diff1)

    # dist2 term: d|y_m - x_{idx2[m]}|^2
    x_near = jnp.take_along_axis(x, idx2[..., None].repeat(D, axis=-1), axis=1)
    diff2 = 2.0 * (y - x_near) * g2[..., None]
    gy = gy + diff2
    gx = jax.vmap(lambda acc, i, v: acc.at[i].add(-v))(gx, idx2, diff2)
    return gx.astype(x.dtype), gy.astype(y.dtype)


chamfer_distance.defvjp(_chamfer_fwd, _chamfer_bwd)


# parity aliases for the 2D/3D/5D extension names
def chamfer_2d(x, y):
    assert x.shape[-1] == 2 and y.shape[-1] == 2
    return chamfer_distance(x, y)


def chamfer_3d(x, y):
    assert x.shape[-1] == 3 and y.shape[-1] == 3
    return chamfer_distance(x, y)


def chamfer_5d(x, y):
    assert x.shape[-1] == 5 and y.shape[-1] == 5
    return chamfer_distance(x, y)


def fscore(dist1: jnp.ndarray, dist2: jnp.ndarray, threshold: float = 0.001):
    """Point-cloud F-score from chamfer distances.

    Equivalent of `ChamferDistancePytorch/fscore.py:3-16`.
    """
    precision_1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=1)
    precision_2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=1)
    denom = precision_1 + precision_2
    f = jnp.where(denom > 0, 2 * precision_1 * precision_2 / jnp.maximum(denom, 1e-12), 0.0)
    return f, precision_1, precision_2
