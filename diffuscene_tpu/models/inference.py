"""Fused Unet1D serving engine — the sampling-path denoiser forward.

Training uses the Flax ``Unet1D`` (models/denoiser.py); sampling reruns that
forward 1000x per scene batch (reference p_sample_loop,
scene_synthesis/networks/diffusion_ddpm.py:355-371), so everything that does
not depend on the current sample ``x`` is hoisted OUT of the per-step work:

- **weight standardization** (a pure function of each WSDense kernel) is
  computed once per sampling call, not once per scan step — XLA does not
  reliably hoist loop-invariant standardizations out of the sampling scan;
- **weights are pre-cast** to the compute dtype once (the Flax path converts
  every f32 kernel to bf16 inside every step: ~65 MB of converts per step);
- **time-FiLM tables**: the per-resblock FiLM rows ``mlp(silu(t_emb(t)))``
  depend only on the integer timestep, so they are precomputed for ALL T
  schedule steps as (T, 2C) tables and gathered per step — this deletes the
  sinusoidal embedding, the two time-MLP matmuls and nine (time_dim -> 2C)
  FiLM matmuls from every step;
- **cond-FiLM** rows (from the per-object condition) and the **cross-attention
  key/value context** (from the text embedding) are constant across steps and
  are precomputed once per sampling call (`precompute_conditioning`);
- attention uses transpose-free einsum forms (no (B,H,D,N) copies), and every
  op runs in the compute dtype with f32 normalization statistics.

The per-step forward is then: per-attribute encoders, 19 ResnetBlocks (two
MXU matmuls each + f32 GroupNorm), 8 linear self-attentions, 1 full
attention, per-attribute decoders — all large-batch MXU matmuls.

Parity with the Flax forward is enforced by tests/test_fused_engine.py.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.fused_level import ChainBlock, apply_chain, build_chain
from ..ops.fused_resblock import standardize_kernel
from .denoiser import Unet1D, head_blockmask, seg_softmax_heads, sinusoidal_pos_emb

# ---------------------------------------------------------------------------
# preparation: everything that is constant across sampling steps
# ---------------------------------------------------------------------------

def _cast(p, dtype):
    return jax.tree.map(lambda a: a.astype(dtype), p)


def _std_block(p: Dict[str, Any], eps: float, dtype) -> Dict[str, Any]:
    """Standardize a Block's WSDense kernel (f32) and cast to compute dtype."""
    proj = {
        "kernel": standardize_kernel(p["proj"]["kernel"], eps=eps).astype(dtype),
        "bias": p["proj"]["bias"].astype(dtype),
    }
    # GroupNorm scale/bias stay f32 (stats are computed in f32)
    return {"proj": proj, "norm": p["norm"]}


def _prep_res(p: Dict[str, Any], ws_eps: float, dtype) -> Dict[str, Any]:
    q = {
        "block1": _std_block(p["block1"], ws_eps, dtype),
        "block2": _std_block(p["block2"], ws_eps, dtype),
    }
    if "res_conv" in p:
        q["res_conv"] = _cast(p["res_conv"], dtype)
    return q


def _time_block_names(n_levels: int):
    names = []
    for i in range(n_levels):
        names += [f"down{i}_block1", f"down{i}_block2"]
    names += ["mid_block1", "mid_block2"]
    for j in range(n_levels):
        names += [f"up{j}_block1", f"up{j}_block2"]
    names += ["final_res_block"]
    return names


def _cond_block_names(n_levels: int):
    names = [f"down{i}_block0" for i in range(n_levels)]
    names += ["mid_block0"]
    names += [f"up{j}_block0" for j in range(n_levels)]
    return names


def prepare_inference_params(
    net: Unet1D,
    denoiser_params: Dict[str, Any],
    num_timesteps: int,
) -> Dict[str, Any]:
    """Build the serving parameter tree from a Flax ``Unet1D`` param tree.

    Standardizes every WSDense kernel once, casts all matmul weights to the
    compute dtype, and precomputes the per-resblock time-FiLM tables for all
    ``num_timesteps`` integer timesteps.

    ``num_timesteps`` MUST equal the sampling schedule length: under jit the
    FiLM-table gather in ``fused_unet1d_forward`` clamps out-of-range
    timesteps, so an undersized table silently yields wrong time embeddings
    (that is why there is no default).
    """
    dt = net.compute_dtype
    p = denoiser_params
    n_levels = len(net.dim_mults)
    # WSDense picks its standardization eps by activation dtype
    # (models/denoiser.py WSDense): 1e-5 in f32, 1e-3 in bf16.
    ws_eps = 1e-5 if dt == jnp.float32 else 1e-3

    prep: Dict[str, Any] = {"blocks": {}, "film_t": {}, "misc": {}}

    # --- time embedding table for all T steps ---
    ts = jnp.arange(num_timesteps, dtype=jnp.int32)
    if net.learned_sinusoidal_cond or net.random_fourier_features:
        w = p["sinu_pos_emb"]["weights"]
        tf = ts.astype(jnp.float32)[:, None]
        freqs = tf * w[None, :] * 2 * math.pi
        t_feat = jnp.concatenate([tf, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
    else:
        t_feat = sinusoidal_pos_emb(ts, net.dim)
    t_feat = t_feat.astype(dt)
    t_emb = jnp.dot(t_feat, p["time_mlp_1"]["kernel"].astype(dt)) + p["time_mlp_1"]["bias"].astype(dt)
    t_emb = jax.nn.gelu(t_emb, approximate=False)
    t_emb = jnp.dot(t_emb, p["time_mlp_2"]["kernel"].astype(dt)) + p["time_mlp_2"]["bias"].astype(dt)
    t_act = jax.nn.silu(t_emb)  # (T, time_dim)

    for name in _time_block_names(n_levels):
        blk = p[name]
        prep["blocks"][name] = _prep_res(blk, ws_eps, dt)
        # (T, 2C) FiLM table: mlp(silu(t_emb)) for every integer timestep
        prep["film_t"][name] = (
            jnp.dot(t_act, blk["mlp"]["kernel"].astype(dt)) + blk["mlp"]["bias"].astype(dt)
        )

    for name in _cond_block_names(n_levels):
        blk = p[name]
        prep["blocks"][name] = _prep_res(blk, ws_eps, dt)
        if "mlp" in blk:  # absent when cond_dim == 0 (unconditioned Unet1D)
            prep["blocks"][name]["mlp"] = _cast(blk["mlp"], dt)

    # --- everything else: plain weight casts ---
    for name in list(p.keys()):
        if name in prep["blocks"] or name in (
            "time_mlp_1", "time_mlp_2", "sinu_pos_emb",
        ):
            continue
        if name.endswith("_attn_norm") or name.endswith("_attncross_norm"):
            prep["misc"][name] = p[name]  # LayerNorm g stays f32
        else:
            prep["misc"][name] = _cast(p[name], dt)

    if net.seperate_all:
        # all decoder MLPs read the same final feature, so their fc0 layers
        # are one concatenated matmul + one GELU pass
        dec = ["bbox_hidden2output", "class_hidden2output"]
        if net.objectness_dim > 0:
            dec.append("objectness_hidden2output")
        if net.objfeat_dim > 0:
            dec.append("objfeat_hidden2output")
        prep["dec_names"] = tuple(dec)
        prep["dec_fc0"] = {
            "kernel": jnp.concatenate(
                [prep["misc"][n]["fc0"]["kernel"] for n in dec], axis=1),
            "bias": jnp.concatenate(
                [prep["misc"][n]["fc0"]["bias"] for n in dec], axis=0),
        }
    return prep


def precompute_conditioning(
    net: Unet1D,
    prep: Dict[str, Any],
    condition: Optional[jnp.ndarray],        # (B, N, cond_dim)
    condition_cross: Optional[jnp.ndarray],  # (B, L, text_dim)
) -> Dict[str, Any]:
    """Per-sampling-call precomputes: cond-FiLM rows and cross-attn contexts."""
    dt = net.compute_dtype
    n_levels = len(net.dim_mults)
    ctx: Dict[str, Any] = {"film_c": {}, "cross": {}}
    if condition is not None:
        c_act = jax.nn.silu(condition.astype(dt))
        for name in _cond_block_names(n_levels):
            mlp = prep["blocks"][name].get("mlp")
            if mlp is None:
                continue
            ctx["film_c"][name] = jnp.dot(c_act, mlp["kernel"]) + mlp["bias"]  # (B,N,2C)
    if net.text_condition and condition_cross is not None:
        cc = condition_cross.astype(dt)
        names = [f"down{i}_attncross" for i in range(n_levels)]
        names += ["mid_attncross"]
        names += [f"up{j}_attncross" for j in range(n_levels)]
        for name in names:
            ap = prep["misc"][name]
            ctx["cross"][name] = _cross_context(ap, cc)
    return ctx


# ---------------------------------------------------------------------------
# per-step ops
# ---------------------------------------------------------------------------

def _dense(p, x):
    y = jnp.einsum("...c,co->...o", x, p["kernel"])
    if "bias" in p:
        y = y + p["bias"]
    return y


def _mlp3(p, x, exact_gelu=False):
    """Encoder/decoder MLP (denoise_net.py:484-504).  The exact (erf) GELU
    lowers to a ~30-term f32 polynomial per element on TPU — measured ~0.5
    ms/step at B=512 across the 5-6 MLPs — so serving defaults to the tanh
    approximation (max abs deviation ~3e-3, below bf16 rounding at these
    magnitudes); pass exact_gelu=True for bit-faithful parity checks."""
    approx = not exact_gelu
    h = jax.nn.gelu(_dense(p["fc0"], x), approximate=approx)
    h = jax.nn.gelu(_dense(p["fc1"], h), approximate=approx)
    return _dense(p["fc2"], h)


def _group_expand(g: int, C: int, dtype):
    """(g, C) one-hot that broadcasts a per-group scalar to its C//g channels
    via one MXU matmul (lane-dim repeats relayout badly on TPU)."""
    grp = jax.lax.broadcasted_iota(jnp.int32, (g, C), 0)
    ch = jax.lax.broadcasted_iota(jnp.int32, (g, C), 1) // (C // g)
    return (grp == ch).astype(dtype)


def _group_norm_coeffs(x, norm_p, groups: int, eps: float = 1e-6):
    """Per-batch-row GroupNorm affine coefficients on (B, N, C): statistics
    reduce over BOTH the object axis and the group's channels (torch/flax
    semantics).  Returns f32 (B, C) ``a, b`` such that GN(x) == x * a + b.

    Stats are f32, but the big-tensor normalization stays a single
    compute-dtype affine so no f32 (B, N, C) intermediate is ever
    materialized (those cost a ~30 us relayout copy each at B=512)."""
    B, N, C = x.shape
    g = groups
    xf = x.astype(jnp.float32).reshape(B, N, g, C // g)
    # one-pass moments (linen fast-variance form): a single read of the big
    # tensor produces both E[x] and E[x^2]
    mean = jnp.mean(xf, axis=(1, 3))            # (B, g)
    m2 = jnp.mean(xf * xf, axis=(1, 3))
    var = m2 - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    G = _group_expand(g, C, jnp.float32)
    a = jnp.einsum("bg,gc->bc", inv, G) * norm_p["scale"]            # (B, C)
    b = norm_p["bias"] - jnp.einsum("bg,gc->bc", mean * inv, G) * norm_p["scale"]
    return a, b


def _group_norm(x, norm_p, groups: int, eps: float = 1e-6):
    a, b = _group_norm_coeffs(x, norm_p, groups, eps)
    return x * a[:, None, :].astype(x.dtype) + b[:, None, :].astype(x.dtype)


def _channel_layernorm(g, x, dt):
    eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    a = inv.astype(dt)
    b = (-mean * inv).astype(dt)
    return (x.astype(dt) * a + b) * g.astype(dt)


def _dense_cat(p, x, x2):
    """Dense over an implicit concat([x, x2], -1) without materializing it:
    split the kernel's input rows instead (skip concats at (B, 12, 1024) cost
    a full write+read of 25 MB each at B=512)."""
    k = p["kernel"]
    c = x.shape[-1]
    y = jnp.einsum("...c,co->...o", x, k[:c]) + jnp.einsum("...c,co->...o", x2, k[c:])
    if "bias" in p:
        y = y + p["bias"]
    return y


def _resblock(p, x, film, dt, *, groups: int, skip=None):
    """film: (B, 1, 2C) time rows or (B, N, 2C) cond rows, compute dtype.
    ``skip``: optional second input, treated as concat([x, skip], -1)."""
    C = p["block1"]["proj"]["kernel"].shape[-1]
    if skip is None:
        h = _dense(p["block1"]["proj"], x)
    else:
        h = _dense_cat(p["block1"]["proj"], x, skip)
    if film is not None and film.shape[1] == 1:
        # Time-FiLM rows are batch-constant over objects, so the FiLM scale/
        # shift folds algebraically into the GN affine coefficients:
        #   (x*a+b)*(fs+1)+fb == x*(a*(fs+1)) + (b*(fs+1)+fb)
        # One elementwise pass over the (B, N, C) tensor instead of two
        # (measured +27 -> +12 us per matmul at B=768 on v5e).
        a, b = _group_norm_coeffs(h, p["block1"]["norm"], groups)
        fs = film[:, 0, :C].astype(jnp.float32) + 1.0   # (B, C)
        fb = film[:, 0, C:].astype(jnp.float32)
        a2 = (a * fs).astype(h.dtype)
        b2 = (b * fs + fb).astype(h.dtype)
        h = h * a2[:, None, :] + b2[:, None, :]
    else:
        h = _group_norm(h, p["block1"]["norm"], groups).astype(dt)
        if film is not None:
            h = h * (film[..., :C] + 1.0) + film[..., C:]
    h = jax.nn.silu(h)
    h = _dense(p["block2"]["proj"], h)
    h = jax.nn.silu(_group_norm(h, p["block2"]["norm"], groups).astype(dt))
    if "res_conv" in p:
        res = _dense(p["res_conv"], x) if skip is None else _dense_cat(p["res_conv"], x, skip)
    elif skip is not None:
        # identity residual over the implicit concat input (possible when
        # concat width == block width, e.g. non-unit dim_mults)
        res = jnp.concatenate([x, skip], axis=-1)
    else:
        res = x
    return h + res


# canonical implementations live in models/denoiser.py (shared with the Flax
# training forward, which uses the same flat-head-layout attention)
_head_blockmask = head_blockmask
_seg_softmax_heads = seg_softmax_heads


def _linear_attention(p, x, dt, heads=4, dim_head=32):
    """Linear attention (denoise_net.py:208-235 math) on flat 2-D head layout.

    q softmaxed over each head's feature segment, k over the object axis;
    the per-head (d x e) contexts live as the diagonal blocks of one
    (H*D, H*D) matrix, computed with a block mask — no (B, N, H, D) tensors.
    """
    B, N, C = x.shape
    qkv = jnp.einsum("bnc,ch->bnh", x, p["to_qkv"]["kernel"])
    q, k, v = jnp.split(qkv, 3, axis=-1)  # (B, N, H*D) each
    q = _seg_softmax_heads(q, heads, dim_head) * (dim_head**-0.5)
    k = jax.nn.softmax(k, axis=1)  # over objects
    ctx = jnp.einsum("bnx,bny->bxy", k, v)  # (B, H*D, H*D); off-head blocks unused
    ctx = ctx * _head_blockmask(heads, dim_head, ctx.dtype)
    out = jnp.einsum("bnx,bxy->bny", q, ctx)
    out = _dense(p["to_out"], out)
    return _channel_layernorm(p["out_norm"]["g"], out, dt)


def _full_attention(p, x, heads=4, dim_head=32):
    """Full softmax attention (denoise_net.py:237-259) without 4-D head
    tensors: per head, the (N x N) scores come from a head-masked 128-wide
    contraction, and masking v the same way makes the outputs accumulate
    into disjoint channel blocks.  N <= 21, so the per-head (B, N, N)
    intermediates are tiny."""
    B, N, C = x.shape
    hd = heads * dim_head
    qkv = jnp.einsum("bnc,ch->bnh", x, p["to_qkv"]["kernel"])
    q, k, v = jnp.split(qkv, 3, axis=-1)  # (B, N, H*D)
    q = q * (dim_head**-0.5)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hd), 2) // dim_head
    out = jnp.zeros_like(v)
    for h in range(heads):
        sel = (lane_head == h).astype(q.dtype)
        sim = jnp.einsum("bix,bjx->bij", q * sel, k)  # k's other-head lanes zeroed by q*sel
        attn = jax.nn.softmax(sim, axis=-1)
        out = out + jnp.einsum("bij,bjy->biy", attn, v * sel)
    return _dense(p["to_out"], out)


def _cross_context(p, cc, heads=4, dim_head=32):
    """Step-invariant half of linear cross-attention: softmaxed K x V as the
    block-diagonal (B, H*D, H*D) context matrix (same layout as
    _linear_attention's ctx)."""
    kv = jnp.einsum("blc,ch->blh", cc, p["to_kv"]["kernel"])
    k, v = jnp.split(kv, 2, axis=-1)  # (B, L, H*D)
    k = jax.nn.softmax(k, axis=1)  # over text tokens
    ctx = jnp.einsum("blx,bly->bxy", k, v)
    return ctx * _head_blockmask(heads, dim_head, ctx.dtype)


def _cross_attention_step(p, x, ctx_mat, dt, heads=4, dim_head=32):
    q = jnp.einsum("bnc,ch->bnh", x, p["to_q"]["kernel"])
    q = _seg_softmax_heads(q, heads, dim_head) * (dim_head**-0.5)
    out = jnp.einsum("bnx,bxy->bny", q, ctx_mat)
    out = _dense(p["to_out"], out)
    return _channel_layernorm(p["out_norm"]["g"], out, dt)


# ---------------------------------------------------------------------------
# the forward
# ---------------------------------------------------------------------------

def fused_unet1d_forward(
    net: Unet1D,
    prep: Dict[str, Any],  # output of prepare_inference_params
    x: jnp.ndarray,  # (B, N, point_dim)
    t: jnp.ndarray,  # (B,) integer timesteps
    condition: Optional[jnp.ndarray] = None,  # (B, N, cond_dim)
    condition_cross: Optional[jnp.ndarray] = None,  # (B, L, text_dim)
    cond_ctx: Optional[Dict[str, Any]] = None,  # precompute_conditioning output
    exact_gelu: bool = False,  # exact erf GELU in the encoder/decoder MLPs
) -> jnp.ndarray:
    """Functionally identical to ``Unet1D.__call__`` (models/denoiser.py)."""
    B, N, _ = x.shape
    dt = net.compute_dtype
    misc = prep["misc"]
    blocks = prep["blocks"]
    n_levels = len(net.dim_mults)

    if cond_ctx is None:
        cond_ctx = precompute_conditioning(net, prep, condition, condition_cross)
    groups = net.resnet_block_groups
    film_c = cond_ctx["film_c"]  # missing keys -> FiLM-free block (film None)
    cross = cond_ctx["cross"]

    def film_t(name):  # (B, 1, 2C) rows gathered from the (T, 2C) table
        return prep["film_t"][name][t][:, None, :]

    x = x.astype(dt)

    # per-attribute encoders (denoise_net.py:512-525)
    if net.seperate_all:
        bd = net.bbox_dim
        h = _mlp3(misc["bbox_embedf"], x[..., :bd], exact_gelu)
        h = h + _mlp3(misc["class_embedf"], x[..., bd : bd + net.class_dim], exact_gelu)
        ofs = bd + net.class_dim
        if net.objectness_dim > 0:
            h = h + _mlp3(misc["objectness_embedf"], x[..., ofs : ofs + net.objectness_dim], exact_gelu)
            ofs += net.objectness_dim
        if net.objfeat_dim > 0:
            h = h + _mlp3(misc["objfeat_embedf"], x[..., ofs : ofs + net.objfeat_dim], exact_gelu)
    else:
        h = x
    h = _dense(misc["init_conv"], h)
    r = h

    skips = []
    for i in range(n_levels):
        h = _resblock(blocks[f"down{i}_block0"], h, film_c.get(f"down{i}_block0"), dt, groups=groups)
        h = _resblock(blocks[f"down{i}_block1"], h, film_t(f"down{i}_block1"), dt, groups=groups)
        skips.append(h)
        if net.text_condition:
            nm = f"down{i}_attncross"
            h = h + _cross_attention_step(
                misc[nm], _channel_layernorm(misc[f"{nm}_norm"]["g"], h, dt), cross[nm], dt
            )
        h = _resblock(blocks[f"down{i}_block2"], h, film_t(f"down{i}_block2"), dt, groups=groups)
        h = h + _linear_attention(
            misc[f"down{i}_attn"],
            _channel_layernorm(misc[f"down{i}_attn_norm"]["g"], h, dt), dt,
        )
        skips.append(h)
        if i == n_levels - 1:
            h = _dense(misc[f"down{i}_proj"], h)

    h = _resblock(blocks["mid_block0"], h, film_c.get("mid_block0"), dt, groups=groups)
    h = _resblock(blocks["mid_block1"], h, film_t("mid_block1"), dt, groups=groups)
    if net.text_condition:
        h = h + _cross_attention_step(
            misc["mid_attncross"],
            _channel_layernorm(misc["mid_attncross_norm"]["g"], h, dt),
            cross["mid_attncross"], dt,
        )
    h = h + _full_attention(
        misc["mid_attn"], _channel_layernorm(misc["mid_attn_norm"]["g"], h, dt)
    )
    h = _resblock(blocks["mid_block2"], h, film_t("mid_block2"), dt, groups=groups)

    for j in range(n_levels):
        h = _resblock(blocks[f"up{j}_block0"], h, film_c.get(f"up{j}_block0"), dt, groups=groups)
        h = _resblock(blocks[f"up{j}_block1"], h, film_t(f"up{j}_block1"), dt,
                      skip=skips.pop(), groups=groups)
        if net.text_condition:
            nm = f"up{j}_attncross"
            h = h + _cross_attention_step(
                misc[nm], _channel_layernorm(misc[f"{nm}_norm"]["g"], h, dt), cross[nm], dt
            )
        h = _resblock(blocks[f"up{j}_block2"], h, film_t(f"up{j}_block2"), dt,
                      skip=skips.pop(), groups=groups)
        h = h + _linear_attention(
            misc[f"up{j}_attn"],
            _channel_layernorm(misc[f"up{j}_attn_norm"]["g"], h, dt), dt,
        )
        if j == n_levels - 1:
            h = _dense(misc[f"up{j}_proj"], h)

    h = _resblock(blocks["final_res_block"], h, film_t("final_res_block"), dt, skip=r, groups=groups)

    if net.seperate_all:
        h0 = jax.nn.gelu(_dense(prep["dec_fc0"], h), approximate=not exact_gelu)
        outs, ofs = [], 0
        for name in prep["dec_names"]:
            pdec = misc[name]
            w = pdec["fc0"]["kernel"].shape[1]
            hi = h0[..., ofs : ofs + w]
            ofs += w
            hi = jax.nn.gelu(_dense(pdec["fc1"], hi), approximate=not exact_gelu)
            outs.append(_dense(pdec["fc2"], hi))
        out = jnp.concatenate(outs, axis=-1)
    else:
        out = _dense(misc["final_conv"], h)
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# rows-layout forward: 2-D (B*N, C) activations + whole-level Pallas chains
# ---------------------------------------------------------------------------
#
# Measured on v5e (docs/PERFORMANCE.md): (B, N, C) tensors with N=12 tile to
# (16, 128) bf16 blocks, so every einsum("bnc,co->bno") computes on 16/12 =
# 1.33x padded rows (~38.7 us per (9216,512)@(512,512) matmul vs ~29 us flat).
# This path keeps the activation flat (M, C) = (B*N, C) end-to-end and runs
# the ResnetBlock chains inside fused_level.apply_chain Pallas kernels
# (weights VMEM-resident, GN/FiLM/SiLU fused into the matmul chain).
# Attention stays in XLA: its matmuls run flat; only the narrow (M, 128)
# head tensors are reshaped to (B, N, 128) for the per-scene softmax/context.
#
# END-TO-END VERDICT: slower than the 3-D engine (6.6 Pallas / 10.0 XLA vs
# 4.53 ms/step at B=768) — the flat<->3-D relayout copies around attention
# and the per-row FiLM gathers cost more than the padding saves.  Kept as an
# opt-in measured experiment; see ops/fused_level.py and PERFORMANCE.md.


def _wd_from_engine_block(bp: Dict[str, Any], C: int, has_skip: bool) -> Dict[str, Any]:
    """Translate a prepared engine resblock dict (prep['blocks'][name]) into
    fused_level.build_chain's weight dict, splitting (2C, C) kernels of
    skip-concat blocks into their h/skip halves."""
    k1 = bp["block1"]["proj"]["kernel"]
    wd = {
        "b1": bp["block1"]["proj"]["bias"],
        "gn1_scale": bp["block1"]["norm"]["scale"],
        "gn1_bias": bp["block1"]["norm"]["bias"],
        "w2": bp["block2"]["proj"]["kernel"],
        "b2": bp["block2"]["proj"]["bias"],
        "gn2_scale": bp["block2"]["norm"]["scale"],
        "gn2_bias": bp["block2"]["norm"]["bias"],
    }
    if has_skip:
        wd["w1"], wd["w1s"] = k1[:C], k1[C:]
    else:
        wd["w1"] = k1
    if "res_conv" in bp:
        kr = bp["res_conv"]["kernel"]
        wd["bres"] = bp["res_conv"]["bias"]
        if has_skip:
            wd["wres"], wd["wres_s"] = kr[:C], kr[C:]
        else:
            wd["wres"] = kr
    return wd


def prepare_chain_params(net: Unet1D, prep: Dict[str, Any],
                         cond_names: frozenset) -> Dict[str, Any]:
    """Build the per-chain stacked weight arrays for the rows-layout forward
    (once per sampling call).  ``cond_names`` lists the block0 names that
    receive cond-FiLM rows this call (depends on the conditioning inputs).

    Raises ValueError for configs the chain kernel does not cover (unequal
    level dims); callers fall back to the 3-D engine."""
    if len(set(net.dim_mults)) != 1:
        raise ValueError("rows-layout chains require equal level dims")
    C = net.dim * net.dim_mults[0]
    n_levels = len(net.dim_mults)
    dt = net.compute_dtype

    def blk(name, film, has_skip=False):
        bp = prep["blocks"][name]
        if has_skip and "res_conv" not in bp:
            raise ValueError(f"{name}: skip-concat block without res_conv")
        spec = ChainBlock(has_skip=has_skip, film=film,
                          has_res_proj="res_conv" in bp)
        return spec, _wd_from_engine_block(bp, C, has_skip), name

    def chain(parts):
        specs = [p[0] for p in parts]
        wds = [p[1] for p in parts]
        films = []
        for spec, _, name in parts:
            films.append((spec.film, name))
        return {
            "chain": build_chain(specs, wds, compute_dtype=dt),
            "films": tuple(films),
            "skips": tuple(s.has_skip for s in specs),
        }

    def c0film(name):
        return "row" if name in cond_names else "none"

    chains: Dict[str, Any] = {}
    for i in range(n_levels):
        chains[f"downA{i}"] = chain([
            blk(f"down{i}_block0", c0film(f"down{i}_block0")),
            blk(f"down{i}_block1", "scene"),
        ])
        chains[f"downB{i}"] = chain([blk(f"down{i}_block2", "scene")])
    chains["midA"] = chain([
        blk("mid_block0", c0film("mid_block0")),
        blk("mid_block1", "scene"),
    ])
    chains["midB"] = chain([blk("mid_block2", "scene")])
    for j in range(n_levels):
        chains[f"upA{j}"] = chain([
            blk(f"up{j}_block0", c0film(f"up{j}_block0")),
            blk(f"up{j}_block1", "scene", has_skip=True),
        ])
        chains[f"upB{j}"] = chain([blk(f"up{j}_block2", "scene", has_skip=True)])
    chains["final"] = chain([blk("final_res_block", "scene", has_skip=True)])
    return chains


def _linear_attention_rows(p, x2, dt, B, N, heads=4, dim_head=32):
    """_linear_attention on flat (M, C) rows: the to_qkv/to_out matmuls run
    flat; only the narrow (M, H*D) head tensors reshape to (B, N, H*D) for
    the per-scene softmax and context contraction."""
    hd = heads * dim_head
    qkv = jnp.einsum("mc,ch->mh", x2, p["to_qkv"]["kernel"])
    q, k, v = jnp.split(qkv, 3, axis=-1)  # (M, H*D)
    q = _seg_softmax_heads(q, heads, dim_head) * (dim_head**-0.5)
    k3 = jax.nn.softmax(k.reshape(B, N, hd), axis=1)
    ctx = jnp.einsum("bnx,bny->bxy", k3, v.reshape(B, N, hd))
    ctx = ctx * _head_blockmask(heads, dim_head, ctx.dtype)
    out = jnp.einsum("bnx,bxy->bny", q.reshape(B, N, hd), ctx).reshape(B * N, hd)
    out = _dense(p["to_out"], out)
    return _channel_layernorm(p["out_norm"]["g"], out, dt)


def _full_attention_rows(p, x2, B, N, heads=4, dim_head=32):
    hd = heads * dim_head
    qkv = jnp.einsum("mc,ch->mh", x2, p["to_qkv"]["kernel"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q3 = (q * (dim_head**-0.5)).reshape(B, N, hd)
    k3 = k.reshape(B, N, hd)
    v3 = v.reshape(B, N, hd)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hd), 2) // dim_head
    out = jnp.zeros_like(v3)
    for h in range(heads):
        sel = (lane_head == h).astype(q3.dtype)
        sim = jnp.einsum("bix,bjx->bij", q3 * sel, k3)
        attn = jax.nn.softmax(sim, axis=-1)
        out = out + jnp.einsum("bij,bjy->biy", attn, v3 * sel)
    return _dense(p["to_out"], out.reshape(B * N, hd))


def _cross_attention_rows(p, x2, ctx_mat, dt, B, N, heads=4, dim_head=32):
    hd = heads * dim_head
    q = jnp.einsum("mc,ch->mh", x2, p["to_q"]["kernel"])
    q = _seg_softmax_heads(q, heads, dim_head) * (dim_head**-0.5)
    out = jnp.einsum("bnx,bxy->bny", q.reshape(B, N, hd), ctx_mat).reshape(B * N, hd)
    out = _dense(p["to_out"], out)
    return _channel_layernorm(p["out_norm"]["g"], out, dt)


def fused_unet1d_forward_rows(
    net: Unet1D,
    prep: Dict[str, Any],     # prepare_inference_params output
    chains: Dict[str, Any],   # prepare_chain_params output
    x: jnp.ndarray,           # (B, N, point_dim)
    t: jnp.ndarray,           # (B,) integer timesteps
    cond_ctx_rows: Dict[str, Any],  # {"film_c2": {name: (M, 2C)}, "cross": ...}
    exact_gelu: bool = False,
    chain_backend: str = "pallas",
) -> jnp.ndarray:
    """Functionally identical to ``fused_unet1d_forward`` (and therefore to
    ``Unet1D.__call__``) on configs with equal level dims; activations stay
    flat (B*N, C) and resblock chains run in Pallas kernels."""
    B, N, _ = x.shape
    M = B * N
    dt = net.compute_dtype
    misc = prep["misc"]
    n_levels = len(net.dim_mults)
    groups = net.resnet_block_groups
    film_c2 = cond_ctx_rows["film_c2"]
    cross = cond_ctx_rows["cross"]

    x2 = x.astype(dt).reshape(M, -1)

    if net.seperate_all:
        bd = net.bbox_dim
        h = _mlp3(misc["bbox_embedf"], x2[:, :bd], exact_gelu)
        h = h + _mlp3(misc["class_embedf"], x2[:, bd : bd + net.class_dim], exact_gelu)
        ofs = bd + net.class_dim
        if net.objectness_dim > 0:
            h = h + _mlp3(misc["objectness_embedf"], x2[:, ofs : ofs + net.objectness_dim], exact_gelu)
            ofs += net.objectness_dim
        if net.objfeat_dim > 0:
            h = h + _mlp3(misc["objfeat_embedf"], x2[:, ofs : ofs + net.objfeat_dim], exact_gelu)
    else:
        h = x2
    h = _dense(misc["init_conv"], h)
    r = h

    def run_chain(key, h, skip_rows=()):
        entry = chains[key]
        films, skips, si = [], [], 0
        for (kind, name), has_skip in zip(entry["films"], entry["skips"]):
            if kind == "scene":
                films.append(prep["film_t"][name][t])       # (B, 2C)
            elif kind == "row":
                films.append(film_c2[name])                  # (M, 2C)
            else:
                films.append(None)
            if has_skip:
                skips.append(skip_rows[si])
                si += 1
            else:
                skips.append(None)
        return apply_chain(entry["chain"], h, films, skips,
                           n_per_scene=N, groups=groups,
                           backend=chain_backend)

    skips = []
    for i in range(n_levels):
        h = run_chain(f"downA{i}", h)
        skips.append(h)
        if net.text_condition:
            nm = f"down{i}_attncross"
            h = h + _cross_attention_rows(
                misc[nm], _channel_layernorm(misc[f"{nm}_norm"]["g"], h, dt),
                cross[nm], dt, B, N)
        h = run_chain(f"downB{i}", h)
        h = h + _linear_attention_rows(
            misc[f"down{i}_attn"],
            _channel_layernorm(misc[f"down{i}_attn_norm"]["g"], h, dt), dt, B, N)
        skips.append(h)
        if i == n_levels - 1:
            h = _dense(misc[f"down{i}_proj"], h)

    h = run_chain("midA", h)
    if net.text_condition:
        h = h + _cross_attention_rows(
            misc["mid_attncross"],
            _channel_layernorm(misc["mid_attncross_norm"]["g"], h, dt),
            cross["mid_attncross"], dt, B, N)
    h = h + _full_attention_rows(
        misc["mid_attn"], _channel_layernorm(misc["mid_attn_norm"]["g"], h, dt), B, N)
    h = run_chain("midB", h)

    for j in range(n_levels):
        h = run_chain(f"upA{j}", h, (skips.pop(),))
        if net.text_condition:
            nm = f"up{j}_attncross"
            h = h + _cross_attention_rows(
                misc[nm], _channel_layernorm(misc[f"{nm}_norm"]["g"], h, dt),
                cross[nm], dt, B, N)
        h = run_chain(f"upB{j}", h, (skips.pop(),))
        h = h + _linear_attention_rows(
            misc[f"up{j}_attn"],
            _channel_layernorm(misc[f"up{j}_attn_norm"]["g"], h, dt), dt, B, N)
        if j == n_levels - 1:
            h = _dense(misc[f"up{j}_proj"], h)

    h = run_chain("final", h, (r,))

    if net.seperate_all:
        h0 = jax.nn.gelu(_dense(prep["dec_fc0"], h), approximate=not exact_gelu)
        outs, ofs = [], 0
        for name in prep["dec_names"]:
            pdec = misc[name]
            w = pdec["fc0"]["kernel"].shape[1]
            hi = h0[:, ofs : ofs + w]
            ofs += w
            hi = jax.nn.gelu(_dense(pdec["fc1"], hi), approximate=not exact_gelu)
            outs.append(_dense(pdec["fc2"], hi))
        out = jnp.concatenate(outs, axis=-1)
    else:
        out = _dense(misc["final_conv"], h)
    return out.astype(jnp.float32).reshape(B, N, -1)
