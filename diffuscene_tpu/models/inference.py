"""Fused Unet1D inference engine — the serving-path denoiser forward.

Training uses the Flax `Unet1D` (models/denoiser.py); sampling reruns that
forward 1000x per scene batch, so this module provides a functionally
identical forward built on the fused Pallas ResNet-block kernel
(ops/fused_resblock.py):

- weight standardization precomputed once per sampling call
  (`prepare_inference_params`) instead of once per step,
- each ResnetBlock = ONE Pallas kernel (two MXU matmuls, GroupNorm via
  one-hot-matmul reductions, FiLM + SiLU on the VPU, residual add) instead
  of ~8 XLA ops with HBM round-trips between them,
- attention / encoders / decoders stay plain XLA (tiny at N<=21).

Parity with the Flax forward is enforced by tests/test_fused_engine.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.fused_resblock import fused_resnet_block, standardize_kernel
from .denoiser import Unet1D, sinusoidal_pos_emb


def prepare_inference_params(net: Unet1D, denoiser_params: Dict[str, Any]) -> Dict[str, Any]:
    """Standardize every WSDense kernel (the Block 'proj' weights) once.

    Returns a new params tree with the same structure; consumed by
    `fused_unet1d_forward`.
    """
    out = jax.tree.map(lambda x: x, denoiser_params)  # shallow-ish copy

    def std_block(p):
        return {**p, "proj": {**p["proj"], "kernel": standardize_kernel(p["proj"]["kernel"])}}

    def std_res(p):
        q = {**p, "block1": std_block(p["block1"]), "block2": std_block(p["block2"])}
        return q

    names = [k for k in denoiser_params if "_block" in k or k == "final_res_block"]
    for k in names:
        out[k] = std_res(denoiser_params[k])
    return out


def _dense(p, x):
    return jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32) + p.get(
        "bias", jnp.zeros(p["kernel"].shape[-1], x.dtype)
    )


def _mlp_enc(p, x):
    h = jax.nn.gelu(_dense(p["fc0"], x), approximate=False)
    h = jax.nn.gelu(_dense(p["fc1"], h), approximate=False)
    return _dense(p["fc2"], h)


def _mlp_dec(p, x):
    h = jax.nn.gelu(_dense(p["fc0"], x), approximate=False)
    h = jax.nn.gelu(_dense(p["fc1"], h), approximate=False)
    return _dense(p["fc2"], h)


def _channel_layernorm(g, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g


def _linear_attention(p, x, heads=4, dim_head=32):
    B, N, C = x.shape
    hidden = heads * dim_head
    qkv = jnp.einsum("bnc,ch->bnh", x, p["to_qkv"]["kernel"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda a: a.reshape(B, N, heads, dim_head).transpose(0, 2, 3, 1)
    q, k, v = split(q), split(k), split(v)
    q = jax.nn.softmax(q, axis=-2) * (dim_head**-0.5)
    k = jax.nn.softmax(k, axis=-1)
    context = jnp.einsum("bhdn,bhen->bhde", k, v)
    out = jnp.einsum("bhde,bhdn->bhen", context, q)
    out = out.transpose(0, 3, 1, 2).reshape(B, N, hidden)
    out = _dense(p["to_out"], out)
    return _channel_layernorm(p["out_norm"]["g"], out)


def _full_attention(p, x, heads=4, dim_head=32):
    B, N, C = x.shape
    hidden = heads * dim_head
    qkv = jnp.einsum("bnc,ch->bnh", x, p["to_qkv"]["kernel"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda a: a.reshape(B, N, heads, dim_head)
    q, k, v = split(q), split(k), split(v)
    q = q * (dim_head**-0.5)
    sim = jnp.einsum("bihd,bjhd->bhij", q, k)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, N, hidden)
    return _dense(p["to_out"], out)


def _cross_attention(p, x, context, heads=4, dim_head=32):
    B, N, C = x.shape
    L = context.shape[1]
    hidden = heads * dim_head
    q = jnp.einsum("bnc,ch->bnh", x, p["to_q"]["kernel"])
    kv = jnp.einsum("blc,ch->blh", context, p["to_kv"]["kernel"])
    k, v = jnp.split(kv, 2, axis=-1)
    q = q.reshape(B, N, heads, dim_head).transpose(0, 2, 3, 1)
    k = k.reshape(B, L, heads, dim_head).transpose(0, 2, 3, 1)
    v = v.reshape(B, L, heads, dim_head).transpose(0, 2, 3, 1)
    q = jax.nn.softmax(q, axis=-2) * (dim_head**-0.5)
    k = jax.nn.softmax(k, axis=-1)
    context_mat = jnp.einsum("bhdl,bhel->bhde", k, v)
    out = jnp.einsum("bhde,bhdn->bhen", context_mat, q)
    out = out.transpose(0, 3, 1, 2).reshape(B, N, hidden)
    out = _dense(p["to_out"], out)
    return _channel_layernorm(p["out_norm"]["g"], out)


def _film(p_res, emb, n_repeat: Optional[int] = None):
    """Resblock FiLM rows from the conditioning embedding.

    emb is (B, E) (time; repeated over objects) or (M, E) (per-object cond).
    Returns (M, 2C) float32.
    """
    h = _dense(p_res["mlp"], jax.nn.silu(emb))
    if n_repeat is not None:
        h = jnp.repeat(h, n_repeat, axis=0)
    return h


def _fused_res(p_res, x2d, film, n_per_scene, compute_dtype):
    return fused_resnet_block(
        x2d, film,
        w1=p_res["block1"]["proj"]["kernel"], b1=p_res["block1"]["proj"]["bias"],
        gn1_scale=p_res["block1"]["norm"]["scale"], gn1_bias=p_res["block1"]["norm"]["bias"],
        w2=p_res["block2"]["proj"]["kernel"], b2=p_res["block2"]["proj"]["bias"],
        gn2_scale=p_res["block2"]["norm"]["scale"], gn2_bias=p_res["block2"]["norm"]["bias"],
        w_res=p_res["res_conv"]["kernel"] if "res_conv" in p_res else None,
        b_res=p_res["res_conv"]["bias"] if "res_conv" in p_res else None,
        n_per_scene=n_per_scene,
        compute_dtype=compute_dtype,
    )


def fused_unet1d_forward(
    net: Unet1D,
    params: Dict[str, Any],  # output of prepare_inference_params
    x: jnp.ndarray,  # (B, N, point_dim)
    t: jnp.ndarray,  # (B,)
    condition: Optional[jnp.ndarray] = None,  # (B, N, cond_dim)
    condition_cross: Optional[jnp.ndarray] = None,  # (B, L, text_dim)
) -> jnp.ndarray:
    """Functionally identical to Unet1D.__call__ (models/denoiser.py)."""
    B, N, _ = x.shape
    C = net.dim
    dt = net.compute_dtype
    M = B * N

    x = x.astype(jnp.float32)

    # per-attribute encoders
    if net.seperate_all:
        bd = net.bbox_dim
        h = _mlp_enc(params["bbox_embedf"], x[..., :bd])
        h = h + _mlp_enc(params["class_embedf"], x[..., bd : bd + net.class_dim])
        ofs = bd + net.class_dim
        if net.objectness_dim > 0:
            h = h + _mlp_enc(params["objectness_embedf"], x[..., ofs : ofs + net.objectness_dim])
            ofs += net.objectness_dim
        if net.objfeat_dim > 0:
            h = h + _mlp_enc(params["objfeat_embedf"], x[..., ofs : ofs + net.objfeat_dim])
    else:
        h = x
    h = _dense(params["init_conv"], h)
    r = h  # (B, N, C)

    # time embedding
    t_emb = sinusoidal_pos_emb(t, C)
    t_emb = _dense(params["time_mlp_2"], jax.nn.gelu(_dense(params["time_mlp_1"], t_emb),
                                                     approximate=False))

    h2 = h.reshape(M, C).astype(dt)
    cond2 = condition.reshape(M, -1) if condition is not None else None
    n_levels = len(net.dim_mults)
    skips = []

    # down path
    for i in range(n_levels):
        p0 = params[f"down{i}_block0"]
        h2 = _fused_res(p0, h2, _film(p0, cond2), N, dt)
        p1 = params[f"down{i}_block1"]
        h2 = _fused_res(p1, h2, _film(p1, t_emb, n_repeat=N), N, dt)
        skips.append(h2)
        if net.text_condition:
            xh = h2.reshape(B, N, C).astype(jnp.float32)
            xh = xh + _cross_attention(
                params[f"down{i}_attncross"],
                _channel_layernorm(params[f"down{i}_attncross_norm"]["g"], xh),
                condition_cross.astype(jnp.float32),
            )
            h2 = xh.reshape(M, C).astype(dt)
        p2 = params[f"down{i}_block2"]
        h2 = _fused_res(p2, h2, _film(p2, t_emb, n_repeat=N), N, dt)
        xh = h2.reshape(B, N, C).astype(jnp.float32)
        xh = xh + _linear_attention(
            params[f"down{i}_attn"],
            _channel_layernorm(params[f"down{i}_attn_norm"]["g"], xh),
        )
        h2 = xh.reshape(M, C).astype(dt)
        skips.append(h2)
        if i == n_levels - 1:
            h2 = _dense(params[f"down{i}_proj"], h2).astype(dt)

    # middle
    p = params["mid_block0"]
    h2 = _fused_res(p, h2, _film(p, cond2), N, dt)
    p = params["mid_block1"]
    h2 = _fused_res(p, h2, _film(p, t_emb, n_repeat=N), N, dt)
    xh = h2.reshape(B, N, C).astype(jnp.float32)
    if net.text_condition:
        xh = xh + _cross_attention(
            params["mid_attncross"],
            _channel_layernorm(params["mid_attncross_norm"]["g"], xh),
            condition_cross.astype(jnp.float32),
        )
    xh = xh + _full_attention(
        params["mid_attn"], _channel_layernorm(params["mid_attn_norm"]["g"], xh)
    )
    h2 = xh.reshape(M, C).astype(dt)
    p = params["mid_block2"]
    h2 = _fused_res(p, h2, _film(p, t_emb, n_repeat=N), N, dt)

    # up path
    for j in range(n_levels):
        p0 = params[f"up{j}_block0"]
        h2 = _fused_res(p0, h2, _film(p0, cond2), N, dt)
        h2 = jnp.concatenate([h2, skips.pop()], axis=-1)
        p1 = params[f"up{j}_block1"]
        h2 = _fused_res(p1, h2, _film(p1, t_emb, n_repeat=N), N, dt)
        if net.text_condition:
            xh = h2.reshape(B, N, C).astype(jnp.float32)
            xh = xh + _cross_attention(
                params[f"up{j}_attncross"],
                _channel_layernorm(params[f"up{j}_attncross_norm"]["g"], xh),
                condition_cross.astype(jnp.float32),
            )
            h2 = xh.reshape(M, C).astype(dt)
        h2 = jnp.concatenate([h2, skips.pop()], axis=-1)
        p2 = params[f"up{j}_block2"]
        h2 = _fused_res(p2, h2, _film(p2, t_emb, n_repeat=N), N, dt)
        xh = h2.reshape(B, N, C).astype(jnp.float32)
        xh = xh + _linear_attention(
            params[f"up{j}_attn"],
            _channel_layernorm(params[f"up{j}_attn_norm"]["g"], xh),
        )
        h2 = xh.reshape(M, C).astype(dt)
        if j == n_levels - 1:
            h2 = _dense(params[f"up{j}_proj"], h2).astype(dt)

    # final
    h2 = jnp.concatenate([h2, r.reshape(M, C).astype(dt)], axis=-1)
    p = params["final_res_block"]
    h2 = _fused_res(p, h2, _film(p, t_emb, n_repeat=N), N, dt)
    hf = h2.reshape(B, N, C).astype(jnp.float32)

    if net.seperate_all:
        out = jnp.concatenate(
            [_mlp_dec(params["bbox_hidden2output"], hf),
             _mlp_dec(params["class_hidden2output"], hf)], axis=-1)
        if net.objectness_dim > 0:
            out = jnp.concatenate([out, _mlp_dec(params["objectness_hidden2output"], hf)], axis=-1)
        if net.objfeat_dim > 0:
            out = jnp.concatenate([out, _mlp_dec(params["objfeat_hidden2output"], hf)], axis=-1)
    else:
        out = _dense(params["final_conv"], hf)
    return out.astype(jnp.float32)
