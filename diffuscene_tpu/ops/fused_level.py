"""Whole-level fused resblock-chain Pallas kernel (2-D row layout).

The sampling hot loop re-runs the Unet1D forward 1000x (reference
p_sample_loop, scene_synthesis/networks/diffusion_ddpm.py:355-371); its FLOPs
are dominated by chains of ResnetBlocks (denoise_net.py:178-206).  Two
measured v5e facts drive this kernel's design (docs/PERFORMANCE.md):

1. **(B, N, C) tensors with N=12 waste 33% of every matmul**: the TPU tiles
   the last two dims to (16, 128) in bf16, so N=12 pads to 16 sublanes and
   `einsum("bnc,co->bno")` runs at ~38.7 us per (9216,512)@(512,512) matmul
   vs ~29 us for the same FLOPs on a flat (9216, 512) operand.  The chain
   therefore works on **2-D (M, C) = (B*N, C) rows**.
2. **A VMEM-resident dependent matmul chain sustains ~152 TFLOP/s** vs ~134
   for the same chain through XLA (each XLA matmul round-trips its 19 MB of
   activations through HBM); elementwise glue fused into the chain is ~free.

Each pallas_call runs a static chain of 1-2 ResnetBlocks:

    z   = x @ W1 (+ skip @ W1s) + b1          # MXU, f32 accumulate
    a,b = groupnorm_coeffs(z)                  # scene-local, one-hot matmuls
    a,b = film_fold(a, b)                      # time-FiLM rows (B, 2C)
    z   = silu(z * a + b)                      # VPU (cond-FiLM rows applied
    z   = z @ W2 + b2                          #  per-row before the silu)
    z   = silu(groupnorm(z))
    out = z + (x | x @ Wres (+ skip @ Wres_s))

with all weights VMEM-resident across the row grid (constant block index)
and the activation never leaving VMEM between the blocks of a chain.

GroupNorm statistics span each scene's N object rows AND the group's
channels (torch/flax GroupNorm on (B, N, C) — models/denoiser.py Block).
Within a row tile holding whole scenes they reduce via two narrow matmuls
(per-row group sums against a one-hot (C, g) matrix, then per-scene sums
against a scene-membership one-hot) and expand back the same way — no lane-
or sublane-crossing reshapes anywhere.

Weight standardization is NOT done here: kernels must be pre-standardized
(models/inference.py does it once per sampling call; WSDense semantics,
denoise_net.py:78-91).

END-TO-END VERDICT (measured, v5e, B=768 full-size sampler): the rows
engines LOSE to the 3-D engine — 6.6 ms/step (Pallas chains) and 10.0
ms/step (XLA chains) vs 4.53 ms/step — because attention still needs
per-scene (B, N, .) shapes, so the forward reshapes flat<->3-D ~20x per
step and each reshape is a real relayout copy that outweighs the 1.33x
sublane-padding saving.  Kept as an opt-in measured experiment
(docs/PERFORMANCE.md "What did NOT help"); the 3-D engine is the default.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class ChainBlock:
    """Static description of one ResnetBlock in a chain."""

    has_skip: bool = False        # block1 input is concat(h, skip) -> split matmuls
    film: str = "none"            # "none" | "scene" (B, 2C) rows | "row" (M, 2C) rows
    has_res_proj: bool = False    # res path is a projection (required when has_skip)

    def __post_init__(self):
        assert self.film in ("none", "scene", "row"), self.film
        # identity residual over an implicit concat would change the output
        # width; the flagship configs always project (res_conv) there
        assert not (self.has_skip and not self.has_res_proj), \
            "skip-cat blocks must have a res projection"


@dataclasses.dataclass
class ChainParams:
    """Stacked device arrays + static spec for one chain call."""

    blocks: Tuple[ChainBlock, ...]
    W: jnp.ndarray                # (nW, C, C) compute dtype, pre-standardized
    V: jnp.ndarray                # (nV, C) f32: per block b1,g1s,g1b,b2,g2s,g2b[,bres]
    n_w: Tuple[int, ...]          # per-block number of (C,C) weights
    n_v: Tuple[int, ...]          # per-block number of (C,) vectors


def build_chain(blocks: Sequence[ChainBlock], weights: Sequence[Dict[str, Any]],
                compute_dtype=jnp.bfloat16) -> ChainParams:
    """Stack a chain's weights into (nW, C, C) + (nV, C) arrays (once per
    sampling call, NOT per step).  ``weights[i]`` keys: w1, [w1s], w2,
    [wres, [wres_s]], b1, gn1_scale, gn1_bias, b2, gn2_scale, gn2_bias,
    [bres].  All (C,C) matrices must already be standardized + cast."""
    Ws: List[jnp.ndarray] = []
    Vs: List[jnp.ndarray] = []
    n_w: List[int] = []
    n_v: List[int] = []
    for blk, wd in zip(blocks, weights):
        w = [wd["w1"]]
        if blk.has_skip:
            w.append(wd["w1s"])
        w.append(wd["w2"])
        if blk.has_res_proj:
            w.append(wd["wres"])
            if blk.has_skip:
                w.append(wd["wres_s"])
        v = [wd["b1"], wd["gn1_scale"], wd["gn1_bias"],
             wd["b2"], wd["gn2_scale"], wd["gn2_bias"]]
        if blk.has_res_proj:
            v.append(wd["bres"])
        Ws += w
        Vs += v
        n_w.append(len(w))
        n_v.append(len(v))
    W = jnp.stack([a.astype(compute_dtype) for a in Ws])
    V = jnp.stack([a.astype(jnp.float32) for a in Vs])
    return ChainParams(blocks=tuple(blocks), W=W, V=V,
                       n_w=tuple(n_w), n_v=tuple(n_v))


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _one_hot_group(C: int, g: int, dtype):
    """(C, g) one-hot: channel c belongs to group c // (C//g)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, g), 0) // (C // g)
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, g), 1)
    return (lane == grp).astype(dtype)


def _one_hot_scene(ts: int, tile_m: int, n: int, dtype):
    """(ts, tile_m) one-hot: row r belongs to scene r // n."""
    row = jax.lax.broadcasted_iota(jnp.int32, (ts, tile_m), 1) // n
    sc = jax.lax.broadcasted_iota(jnp.int32, (ts, tile_m), 0)
    return (row == sc).astype(dtype)


def _silu(z, dt):
    """SiLU with f32 transcendental: Mosaic rejects jax.nn.sigmoid's
    weak-typed f32 constants broadcast into bf16 vectors."""
    zf = z.astype(jnp.float32)
    return (zf * jax.lax.logistic(zf)).astype(dt)


def _gn_coeffs(z, S, Gm, Gt, n: int, g: int, scale, bias, eps: float):
    """Scene-level GroupNorm affine coefficients: (ts, C) a, b with
    GN(z)[r] == z[r] * a[scene(r)] + b[scene(r)].  z: (tile_m, C) f32."""
    C = z.shape[-1]
    gs = C // g
    zG = jnp.dot(z, Gm, preferred_element_type=jnp.float32)          # (tile_m, g)
    z2G = jnp.dot(z * z, Gm, preferred_element_type=jnp.float32)
    denom = 1.0 / (n * gs)
    mean = jnp.dot(S, zG, preferred_element_type=jnp.float32) * denom   # (ts, g)
    e2 = jnp.dot(S, z2G, preferred_element_type=jnp.float32) * denom
    # one-pass variance can cancel slightly negative; clamp like
    # ChannelLayerNorm (models/denoiser.py) so rsqrt never sees < eps
    var = jnp.maximum(e2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = jnp.dot(inv, Gt, preferred_element_type=jnp.float32) * scale           # (ts, C)
    b = bias - jnp.dot(mean * inv, Gt, preferred_element_type=jnp.float32) * scale
    return a, b


def _chain_kernel(*refs, blocks: Tuple[ChainBlock, ...], n_w, n_v,
                  n: int, groups: int, eps: float, tile_m: int, ts: int,
                  n_skip: int, n_film: int, dt):
    """refs order: x, skip_0..skip_{n_skip-1}, film_0..film_{n_film-1},
    W, V, out."""
    x_ref = refs[0]
    skip_refs = refs[1:1 + n_skip]
    film_refs = refs[1 + n_skip:1 + n_skip + n_film]
    w_ref = refs[1 + n_skip + n_film]
    v_ref = refs[2 + n_skip + n_film]
    out_ref = refs[3 + n_skip + n_film]

    C = w_ref.shape[-1]
    f32 = jnp.float32
    Gm = _one_hot_group(C, groups, f32)
    Gt = Gm.T
    S = _one_hot_scene(ts, tile_m, n, f32)
    St = S.T

    h = x_ref[:]
    wi = vi = si = fi = 0
    for bi, blk in enumerate(blocks):
        xin = h
        b1 = v_ref[vi]
        g1s, g1b = v_ref[vi + 1], v_ref[vi + 2]
        b2 = v_ref[vi + 3]
        g2s, g2b = v_ref[vi + 4], v_ref[vi + 5]

        z = jnp.dot(h, w_ref[wi], preferred_element_type=f32)
        wj = wi + 1
        if blk.has_skip:
            sk = skip_refs[si][:]
            z = z + jnp.dot(sk, w_ref[wj], preferred_element_type=f32)
            wj += 1
        # match the XLA engine's precision: the dense output is a
        # compute-dtype tensor and the GN statistics are f32 moments of it
        z = (z + b1).astype(dt)
        zf = z.astype(f32)
        a, b = _gn_coeffs(zf, S, Gm, Gt, n, groups, g1s, g1b, eps)
        if blk.film == "scene":
            f = film_refs[fi][:].astype(f32)   # (ts, 2C)
            fs = f[:, :C] + 1.0
            a = a * fs
            b = b * fs + f[:, C:]
            fi += 1
        A = jnp.dot(St, a, preferred_element_type=f32).astype(dt)   # (tile_m, C)
        Bv = jnp.dot(St, b, preferred_element_type=f32).astype(dt)
        z = z * A + Bv
        if blk.film == "row":
            f = film_refs[fi][:].astype(dt)    # (tile_m, 2C)
            one = jnp.ones((), dt)             # Mosaic rejects weak-typed f32
            z = z * (f[:, :C] + one) + f[:, C:]  # scalars broadcast into bf16
            fi += 1
        z = _silu(z, dt)

        z2 = jnp.dot(z, w_ref[wj], preferred_element_type=f32)
        wj += 1
        z2 = (z2 + b2).astype(dt)
        a, b = _gn_coeffs(z2.astype(f32), S, Gm, Gt, n, groups, g2s, g2b, eps)
        A = jnp.dot(St, a, preferred_element_type=f32).astype(dt)
        Bv = jnp.dot(St, b, preferred_element_type=f32).astype(dt)
        z2 = z2 * A + Bv
        z2 = _silu(z2, dt)

        if blk.has_res_proj:
            res = jnp.dot(xin, w_ref[wj], preferred_element_type=f32)
            wj += 1
            if blk.has_skip:
                res = res + jnp.dot(sk, w_ref[wj], preferred_element_type=f32)
                wj += 1
            res = res + v_ref[vi + 6]
            res = res.astype(dt)
        else:
            res = xin
        h = z2 + res
        if blk.has_skip:
            si += 1
        wi += n_w[bi]
        vi += n_v[bi]
    out_ref[:] = h


# ---------------------------------------------------------------------------
# XLA backend: the same chain math on flat rows, no Pallas
# ---------------------------------------------------------------------------
#
# Captures the layout win alone (matmuls on (M, C) rows run ~1.33x faster
# than (B, 12, C) on v5e) and compiles in seconds instead of minutes.  The
# GroupNorm moments reduce through a narrow (M, g) tensor (one (C, g) one-hot
# matmul + a (B, n, g) reshape-sum) so the wide activation never relayouts;
# the per-scene affine expands back to rows via a fused row->scene gather.


def apply_chain_xla(
    chain: ChainParams,
    x: jnp.ndarray,
    films: Sequence[Optional[jnp.ndarray]],
    skips: Sequence[Optional[jnp.ndarray]],
    n_per_scene: int,
    groups: int = 8,
    eps: float = 1e-6,
) -> jnp.ndarray:
    M, C = x.shape
    n = n_per_scene
    B = M // n
    assert M == B * n
    films = [f for f in films if f is not None]
    skips = [s for s in skips if s is not None]
    dt = x.dtype
    f32 = jnp.float32
    g = groups
    gs = C // g
    Gm = _one_hot_group(C, g, f32)
    row_scene = jax.lax.broadcasted_iota(jnp.int32, (M,), 0) // n

    def gn_affine(z, scale, bias):
        """(M, C) compute-dtype z -> per-scene affine rows (M, C) a, b."""
        zf = z.astype(f32)
        zG = jnp.dot(zf, Gm)                       # (M, g)
        z2G = jnp.dot(zf * zf, Gm)
        mean = zG.reshape(B, n, g).sum(1) / (n * gs)   # (B, g)
        e2 = z2G.reshape(B, n, g).sum(1) / (n * gs)
        var = jnp.maximum(e2 - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)                 # (B, g)
        a = jnp.repeat(inv, gs, axis=1) * scale                    # (B, C)
        b = bias - jnp.repeat(mean * inv, gs, axis=1) * scale
        return a, b

    h = x
    wi = vi = si = fi = 0
    W, V = chain.W, chain.V
    for bi, blk in enumerate(chain.blocks):
        xin = h
        b1 = V[vi]
        g1s, g1b = V[vi + 1], V[vi + 2]
        b2 = V[vi + 3]
        g2s, g2b = V[vi + 4], V[vi + 5]

        z = jnp.dot(h, W[wi], preferred_element_type=f32)
        wj = wi + 1
        if blk.has_skip:
            sk = skips[si]
            z = z + jnp.dot(sk, W[wj], preferred_element_type=f32)
            wj += 1
        z = (z + b1).astype(dt)
        a, b = gn_affine(z, g1s, g1b)
        if blk.film == "scene":
            f = films[fi].astype(f32)              # (B, 2C)
            fs = f[:, :C] + 1.0
            a = a * fs
            b = b * fs + f[:, C:]
            fi += 1
        z = z * a.astype(dt)[row_scene] + b.astype(dt)[row_scene]
        if blk.film == "row":
            f = films[fi].astype(dt)               # (M, 2C)
            z = z * (f[:, :C] + jnp.ones((), dt)) + f[:, C:]
            fi += 1
        z = _silu(z, dt)

        z2 = jnp.dot(z, W[wj], preferred_element_type=f32)
        wj += 1
        z2 = (z2 + b2).astype(dt)
        a, b = gn_affine(z2, g2s, g2b)
        z2 = z2 * a.astype(dt)[row_scene] + b.astype(dt)[row_scene]
        z2 = _silu(z2, dt)

        if blk.has_res_proj:
            res = jnp.dot(xin, W[wj], preferred_element_type=f32)
            wj += 1
            if blk.has_skip:
                res = res + jnp.dot(sk, W[wj], preferred_element_type=f32)
                wj += 1
            res = (res + V[vi + 6]).astype(dt)
        else:
            res = xin
        h = z2 + res
        if blk.has_skip:
            si += 1
        wi += chain.n_w[bi]
        vi += chain.n_v[bi]
    return h


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def apply_chain(
    chain: ChainParams,
    x: jnp.ndarray,                    # (M, C) compute dtype, M = B * n
    films: Sequence[Optional[jnp.ndarray]],  # per block: None | (B, 2C) | (M, 2C)
    skips: Sequence[Optional[jnp.ndarray]],  # per block: None | (M, C)
    n_per_scene: int,
    groups: int = 8,
    eps: float = 1e-6,
    tile_scenes: int = 32,
    backend: str = "pallas",
) -> jnp.ndarray:
    """Run the chain over all rows.  Rows are tiled in whole scenes so the
    GroupNorm statistics stay tile-local; B must divide by the scene tile
    (callers use B % 32 == 0 batches; pass a smaller ``tile_scenes`` to
    relax).  ``backend="xla"`` runs the identical math without Pallas."""
    M, C = x.shape
    n = n_per_scene
    B = M // n
    assert M == B * n
    # validate films/skips against the chain BEFORE backend dispatch so the
    # XLA path rejects misaligned inputs exactly like the Pallas path
    assert len(films) == len(chain.blocks) and len(skips) == len(chain.blocks)
    for blk, f, sk in zip(chain.blocks, films, skips):
        assert (f is not None) == (blk.film != "none")
        assert (sk is not None) == blk.has_skip
        if f is not None:
            assert f.shape == ((B, 2 * C) if blk.film == "scene" else (M, 2 * C)), f.shape
    if backend == "xla":
        return apply_chain_xla(chain, x, films, skips, n_per_scene,
                               groups=groups, eps=eps)
    dt = x.dtype

    # scene tile: whole scenes, rows a multiple of the 16-sublane bf16 tile
    ts = tile_scenes
    while ts > 1 and (B % ts != 0 or (ts * n) % 16 != 0):
        ts -= 1
    assert B % ts == 0 and (ts * n) % 16 == 0, (
        f"cannot tile B={B} scenes of n={n} rows into sublane-aligned tiles")
    tile_m = ts * n
    grid = (B // ts,)

    film_list = [f for f in films if f is not None]
    skip_list = [s for s in skips if s is not None]
    blocks = chain.blocks

    kernel = functools.partial(
        _chain_kernel, blocks=blocks, n_w=chain.n_w, n_v=chain.n_v,
        n=n, groups=groups, eps=eps, tile_m=tile_m, ts=ts,
        n_skip=len(skip_list), n_film=len(film_list), dt=dt,
    )
    row_spec = pl.BlockSpec((tile_m, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [row_spec]
    in_specs += [row_spec] * len(skip_list)
    for blk in blocks:
        if blk.film == "scene":
            in_specs.append(pl.BlockSpec((ts, 2 * C), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
        elif blk.film == "row":
            in_specs.append(pl.BlockSpec((tile_m, 2 * C), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(chain.W.shape, lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(chain.V.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))

    nW = chain.W.shape[0]
    flops = 2 * M * C * C * nW
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((M, C), dt),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 + len(skip_list)) * M * C * 2 + nW * C * C * 2,
            transcendentals=2 * M * C * len(blocks),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, *skip_list, *film_list, chain.W, chain.V)
