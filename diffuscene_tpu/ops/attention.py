"""Fused set-attention Pallas kernel (pre-norm + attention + residual).

The denoiser's attention operates over N <= 21 object slots
(threed_front.py:204-216), so a whole scene's attention fits trivially in
VMEM (SURVEY.md §5.7).  This kernel fuses the reference's
``Residual(PreNorm(Attention))`` block (denoise_net.py:237-259 + 93-123):

    out = x + W_out @ softmax(q k^T / sqrt(d)) v,   q,k,v = W_qkv LN(x)

into one VMEM pass per scene: channel-LayerNorm, one (N, C)x(C, 3HD) MXU
matmul for qkv, per-head (N, N) attention on the VPU/MXU, the output
projection, and the residual add.  Weights stay VMEM-resident across the
batch grid (constant block index).

At the shipped sizes (N=12..21, H=4, D=32) this is a latency-bound
correctness kernel, not a throughput win — the sampling step is matmul-rate
bound (see ops/fused_resblock.py) — but it is the Pallas lowering the
north-star calls for and scales to larger object sets.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layernorm_g(x, g, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g


def _attn_kernel(x_ref, g_ref, wqkv_ref, wout_ref, bout_ref, out_ref,
                 *, heads: int, dim_head: int, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (N, C)
    ln = _layernorm_g(x, g_ref[:], eps)
    qkv = jnp.dot(ln.astype(wqkv_ref.dtype), wqkv_ref[:],
                  preferred_element_type=jnp.float32)  # (N, 3HD)
    hd = heads * dim_head
    scale = dim_head**-0.5
    outs = []
    for h in range(heads):
        q = qkv[:, h * dim_head : (h + 1) * dim_head] * scale
        k = qkv[:, hd + h * dim_head : hd + (h + 1) * dim_head]
        v = qkv[:, 2 * hd + h * dim_head : 2 * hd + (h + 1) * dim_head]
        sim = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (N, N)
        attn = jax.nn.softmax(sim, axis=-1)
        outs.append(jnp.dot(attn, v, preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1)  # (N, HD)
    y = jnp.dot(o.astype(wout_ref.dtype), wout_ref[:],
                preferred_element_type=jnp.float32) + bout_ref[:]
    out_ref[0] = (x + y).astype(out_ref.dtype)


def fused_set_attention(
    x: jnp.ndarray,          # (B, N, C)
    g_prenorm: jnp.ndarray,  # (C,) pre-norm LayerNorm scale
    w_qkv: jnp.ndarray,      # (C, 3*heads*dim_head)
    w_out: jnp.ndarray,      # (heads*dim_head, C)
    b_out: jnp.ndarray,      # (C,)
    heads: int = 4,
    dim_head: int = 32,
    eps: float = 1e-5,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """x + Attention(LN(x)) fused per scene."""
    B, N, C = x.shape
    kernel = functools.partial(_attn_kernel, heads=heads, dim_head=dim_head, eps=eps)
    const = lambda shape: pl.BlockSpec(shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            const((1, C)),
            const(w_qkv.shape),
            const(w_out.shape),
            const((1, C)),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(
        x,
        g_prenorm.reshape(1, C).astype(jnp.float32),
        w_qkv.astype(compute_dtype),
        w_out.astype(compute_dtype),
        b_out.reshape(1, C).astype(jnp.float32),
    )
