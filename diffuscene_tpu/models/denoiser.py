"""Unet1D denoiser over object sets — Flax/linen, (B, N, C) layout.

TPU-native re-design of the reference denoiser
(`scene_synthesis/networks/denoise_net.py:335-593`).  Key observations driving
the design:

- every conv in the reference has kernel size 1 (denoise_net.py:397,440,459),
  so the network is a per-object MLP stack + set attention; on TPU the natural
  layout is (batch, objects, channels) with `nn.Dense` everywhere — each layer
  is one large (B*N, C_in)x(C_in, C_out) matmul on the MXU.
- `Downsample`/`Upsample` are identity for the shipped `dim_mults=[1,1,1,1]`
  (denoise_net.py:55-76), so "resolution" never changes; we keep the level
  structure for architectural parity.
- attention operates over N <= 21 object slots (self) and ~50 text tokens
  (cross); both comfortably fit in VMEM, so the einsum formulations below fuse
  into a handful of MXU ops under XLA.

Architectural semantics (block structure, weight standardization, group norm,
linear-attention math, time embedding) match the reference so that pretrained
checkpoints are convertible; see `train/convert.py`.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _ws_standardize_fast(kernel, eps, dtype):
    """Weight standardization with a residual-light custom VJP.

    Forward matches WSDense's exact path to within one-pass-variance
    rounding (E[k^2]-E[k]^2 instead of jnp.var's two-pass form — halves the
    f32 kernel reads).  The VJP is the layernorm gradient
    ``dk = inv * (dw - mean(dw) - what * mean(dw * what))`` computed from
    the SAVED compute-dtype standardized kernel ``what`` and ``inv`` —
    the default VJP instead re-reads the f32 kernel and re-derives the
    moments every backward step (the prime suspect of the round-4 backward
    gap, VERDICT r4 Next #2; reference anchor denoise_net.py:78-91).
    Using the bf16 ``what`` in the projection term adds ~2^-9 relative error
    on that correction term only; opt-in via Unet1D.ws_fast_vjp.
    """
    w, _ = _ws_standardize_fast_fwd(kernel, eps, dtype)
    return w


def _ws_standardize_fast_fwd(kernel, eps, dtype):
    kf = kernel  # f32 master
    mean = jnp.mean(kf, axis=0, keepdims=True)
    mean2 = jnp.mean(kf * kf, axis=0, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    w = ((kf - mean) * inv).astype(dtype)
    return w, (w, inv)


def _ws_standardize_fast_bwd(eps, dtype, res, dw):
    w, inv = res
    dwf = dw.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    m_dw = jnp.mean(dwf, axis=0, keepdims=True)
    m_dww = jnp.mean(dwf * wf, axis=0, keepdims=True)
    dk = inv * (dwf - m_dw - wf * m_dww)
    return (dk,)


_ws_standardize_fast.defvjp(_ws_standardize_fast_fwd, _ws_standardize_fast_bwd)


class WSDense(nn.Module):
    """Dense layer with weight standardization over the input axis.

    Equivalent of the reference WeightStandardizedConv2d (actually a k=1
    Conv1d, denoise_net.py:78-91): per-output-unit mean/var (biased) over the
    input dimension, eps 1e-5 in float32.

    ``fast_vjp`` switches to :func:`_ws_standardize_fast` (one-pass forward
    moments + residual-light backward); ``standardize=False`` skips the
    standardization entirely (timing-attribution ablation only — same param
    tree, different math).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    fast_vjp: bool = False
    standardize: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        if not self.standardize:
            w = kernel.astype(self.dtype)
        elif self.fast_vjp:
            w = _ws_standardize_fast(kernel, eps, self.dtype)
        else:
            # standardize in f32 for stability, then cast to the compute dtype
            mean = jnp.mean(kernel, axis=0, keepdims=True)
            var = jnp.var(kernel, axis=0, keepdims=True)
            w = ((kernel - mean) * jax.lax.rsqrt(var + eps)).astype(self.dtype)
        y = jnp.einsum("...i,io->...o", x.astype(self.dtype), w)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, scale-only, biased variance.

    Equivalent of reference LayerNorm (denoise_net.py:93-102).  Moments are
    one-pass (E[x^2] - E[x]^2, both reductions over the same read) — `jnp.var`
    depends on the mean and forces XLA into a second full read of x
    (measured on the serving engine: models/inference.py `_channel_layernorm`).
    """

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * g.astype(x.dtype)


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal timestep embedding (denoise_net.py:127-139). t: (B,) -> (B, dim)."""
    half_dim = dim // 2
    emb = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """(denoise_net.py:141-156) — learned/random Fourier features + raw t."""

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t):
        half_dim = self.dim // 2
        weights = self.param("weights", nn.initializers.normal(1.0), (half_dim,), jnp.float32)
        if self.is_random:
            weights = jax.lax.stop_gradient(weights)
        t = t.astype(jnp.float32)[:, None]
        freqs = t * weights[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class Block(nn.Module):
    """WSDense -> GroupNorm -> (scale,shift) -> SiLU.  (denoise_net.py:160-176)"""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    ws_fast_vjp: bool = False
    weight_standardize: bool = True
    ablate_norm: bool = False

    @nn.compact
    def __call__(self, x, scale_shift: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        x = WSDense(self.dim_out, dtype=self.dtype, fast_vjp=self.ws_fast_vjp,
                    standardize=self.weight_standardize, name="proj")(x)
        if not self.ablate_norm:  # timing-attribution ablation only
            x = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two Blocks with FiLM modulation from a conditioning vector.

    (denoise_net.py:178-206).  ``emb`` may be (B, C) (time embedding,
    broadcast over objects) or (B, N, C) (per-object condition).
    """

    dim_out: int
    emb_dim: int = 0
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    ws_fast_vjp: bool = False
    weight_standardize: bool = True
    ablate_norm: bool = False

    @nn.compact
    def __call__(self, x, emb: Optional[jnp.ndarray] = None):
        scale_shift = None
        if self.emb_dim > 0 and emb is not None:
            h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="mlp")(nn.silu(emb))
            if h.ndim == 2:
                h = h[:, None, :]  # (B, 1, 2C) broadcast over objects
            scale_shift = (h[..., : self.dim_out], h[..., self.dim_out :])
        ws = dict(ws_fast_vjp=self.ws_fast_vjp,
                  weight_standardize=self.weight_standardize,
                  ablate_norm=self.ablate_norm)
        h = Block(self.dim_out, groups=self.groups, dtype=self.dtype, name="block1", **ws)(x, scale_shift)
        h = Block(self.dim_out, groups=self.groups, dtype=self.dtype, name="block2", **ws)(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype, name="res_conv")(x)
        return h + x


def head_blockmask(heads: int, dim_head: int, dtype) -> jnp.ndarray:
    """(H*D, H*D) block-diagonal ones: 1 where both channels belong to the
    same head.  Lets multi-head attention run on flat (B, N, H*D) tensors —
    4-D (B, N, H, D) head tensors with D=32 trailing dims tile terribly on
    TPU ((8,128) native tiles -> 8x padding waste and a ~26 us relayout copy
    per q/k/v per block, measured ~1.4 ms/step at B=512)."""
    hd = heads * dim_head
    a = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim_head
    b = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim_head
    return (a == b).astype(dtype)


def seg_softmax_heads(x: jnp.ndarray, heads: int, dim_head: int) -> jnp.ndarray:
    """Softmax within each head's dim_head-channel segment of the last axis,
    without reshaping to 4-D.  The stabilizing max is the PER-SEGMENT max
    (masked row maxes recombined), not the global row max — with a global
    max, a head whose logits trail another head's by ~88 ln-units would
    underflow its whole segment to exp()=0 and divide 0/0.  Segment sums
    ride the MXU via the block-diagonal ones matrix."""
    xf = x.astype(jnp.float32)
    hd = heads * dim_head
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, hd), 1).reshape(
        (1,) * (xf.ndim - 1) + (hd,)
    ) // dim_head
    m = jnp.zeros_like(xf)
    for h in range(heads):
        sel = lane_head == h
        mh = jnp.max(jnp.where(sel, xf, -jnp.inf), axis=-1, keepdims=True)
        m = m + jnp.where(sel, mh, 0.0)
    e = jnp.exp(xf - m)
    denom = jnp.einsum("...x,xy->...y", e, head_blockmask(heads, dim_head, jnp.float32))
    return (e / denom).astype(x.dtype)


class LinearAttention(nn.Module):
    """Efficient 'linear' self-attention (denoise_net.py:208-235).

    q softmaxed over the head-feature axis, k over the sequence axis; the
    per-head (d x e) context matrices contract away the sequence dim.  Heads
    stay flat in the channel axis with a block-diagonal mask (same math as
    the 4-D head form, measured ~3x faster per block on TPU — see
    head_blockmask; the serving engine models/inference.py uses the
    identical formulation).
    """

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (B, N, H*D) each

        q = seg_softmax_heads(q, self.heads, self.dim_head) * (self.dim_head**-0.5)
        k = jax.nn.softmax(k, axis=1)  # over the object axis

        ctx = jnp.einsum("bnx,bny->bxy", k, v)  # (B, H*D, H*D)
        ctx = ctx * head_blockmask(self.heads, self.dim_head, ctx.dtype)
        out = jnp.einsum("bnx,bxy->bny", q, ctx)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return ChannelLayerNorm(name="out_norm")(out)


class Attention(nn.Module):
    """Full softmax self-attention (denoise_net.py:237-259), flat head layout:
    per head, the (N x N) scores come from a head-masked H*D-wide contraction,
    and masking v the same way accumulates outputs into disjoint channel
    blocks.  N <= 21, so the per-head (B, N, N) intermediates are tiny."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (B, N, H*D)
        q = q * (self.dim_head**-0.5)
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hidden), 2) // self.dim_head
        out = jnp.zeros_like(v)
        for h in range(self.heads):
            sel = (lane_head == h).astype(q.dtype)
            sim = jnp.einsum("bix,bjx->bij", q * sel, k)  # k's other-head lanes zeroed via q*sel
            attn = jax.nn.softmax(sim, axis=-1)
            out = out + jnp.einsum("bij,bjy->biy", attn, v * sel)
        return nn.Dense(C, dtype=self.dtype, name="to_out")(out)


class _CrossAttentionBase(nn.Module):
    """Linear cross-attention from object slots to text tokens, flat head
    layout (denoise_net.py:261-297 math): q from x (B, N, C); k, v from
    context (B, L, C_ctx); the per-head contexts live as diagonal blocks of
    one (H*D, H*D) matrix."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32
    out_norm: bool = True

    @nn.compact
    def __call__(self, x, context):
        B, N, C = x.shape
        hidden = self.heads * self.dim_head
        q = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(hidden * 2, use_bias=False, dtype=self.dtype, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)  # (B, L, H*D)

        q = seg_softmax_heads(q, self.heads, self.dim_head) * (self.dim_head**-0.5)
        k = jax.nn.softmax(k, axis=1)  # over text tokens

        ctx = jnp.einsum("blx,bly->bxy", k, v)
        ctx = ctx * head_blockmask(self.heads, self.dim_head, ctx.dtype)
        out = jnp.einsum("bnx,bxy->bny", q, ctx)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        if self.out_norm:
            out = ChannelLayerNorm(name="out_norm")(out)
        return out


class LinearAttentionCross(_CrossAttentionBase):
    """Linear cross-attention with the output LayerNorm (denoise_net.py:261-297)."""

    out_norm: bool = True


class AttentionCross(_CrossAttentionBase):
    """Cross-attention variant without the output LayerNorm.

    Note the reference ``AttentionCross`` (denoise_net.py:299-332) uses the
    same softmax-q/softmax-k *linear* attention math despite its name; we
    preserve that.
    """

    out_norm: bool = False


class _MLPEnc(nn.Module):
    """Per-attribute encoder MLP (denoise_net.py:484-493): C_in -> d -> 2d -> d."""

    hidden: int
    dtype: jnp.dtype = jnp.float32
    exact_gelu: bool = True

    @nn.compact
    def __call__(self, x):
        a = not self.exact_gelu
        x = nn.gelu(nn.Dense(self.hidden, dtype=self.dtype, name="fc0")(x), approximate=a)
        x = nn.gelu(nn.Dense(self.hidden * 2, dtype=self.dtype, name="fc1")(x), approximate=a)
        return nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(x)


class _MLPDec(nn.Module):
    """Per-attribute decoder MLP (denoise_net.py:495-504): d -> 2d -> d -> C_out."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32
    exact_gelu: bool = True

    @nn.compact
    def __call__(self, x):
        a = not self.exact_gelu
        x = nn.gelu(nn.Dense(self.hidden * 2, dtype=self.dtype, name="fc0")(x), approximate=a)
        x = nn.gelu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x), approximate=a)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class Unet1D(nn.Module):
    """Permutation-equivariant set denoiser.

    Structure mirrors reference Unet1D (denoise_net.py:335-593): per-attribute
    encoder MLPs summed into a joint feature (``seperate_all``), an init
    projection, `len(dim_mults)` levels of [cond-ResBlock, time-ResBlock,
    (cross-attn), time-ResBlock, linear-self-attn, level-proj], a middle stack
    with full attention, the mirrored up path with skip concatenations, a
    final residual block on [x, r], and per-attribute decoder MLPs.
    """

    dim: int = 512
    dim_mults: Sequence[int] = (1, 1, 1, 1)
    channels: int = 62
    objectness_dim: int = 0
    class_dim: int = 22
    translation_dim: int = 3
    size_dim: int = 3
    angle_dim: int = 2
    objfeat_dim: int = 32
    context_dim: int = 0
    instanclass_dim: int = 128
    seperate_all: bool = True
    text_condition: bool = False
    text_dim: int = 512
    resnet_block_groups: int = 8
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    out_dim: Optional[int] = None
    compute_dtype: jnp.dtype = jnp.float32
    # exact erf GELU (the reference torch default) vs the tanh approximation.
    # The tanh form avoids a large f32 erf polynomial on TPU (measured win in
    # the serving engine, models/inference.py); exact stays the default so
    # converted reference checkpoints are bit-faithful.  The difference is
    # ~1e-3 absolute on activations — v-prediction training is insensitive.
    exact_gelu: bool = True
    # Residual-light custom VJP for weight standardization (see WSDense):
    # identical forward up to one-pass-variance rounding, cheaper backward
    # (no f32 kernel re-read).  Off by default for bit-exact torch parity.
    ws_fast_vjp: bool = False
    # Timing-attribution ablation only: skip weight standardization entirely
    # (same param tree, different math — NOT the reference architecture).
    weight_standardize: bool = True
    # Timing-attribution ablations only (tools/train_attrib_r5.py): drop the
    # self/cross-attention blocks (and their pre-norms), or the GroupNorms
    # inside resblocks.  These CHANGE the param tree — cost bounds include
    # the ablated params' backward + optimizer share.
    ablate_attention: bool = False
    ablate_norms: bool = False

    @property
    def bbox_dim(self):
        return self.translation_dim + self.size_dim + self.angle_dim

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, N, point_dim)
        beta: jnp.ndarray,  # (B,) timesteps
        context: Optional[jnp.ndarray] = None,  # (B, N, context_dim + instanclass_dim)
        context_cross: Optional[jnp.ndarray] = None,  # (B, L, text_dim)
    ) -> jnp.ndarray:
        B, N, C_in = x.shape
        cond_dim = self.context_dim + self.instanclass_dim
        groups = self.resnet_block_groups
        dt = self.compute_dtype

        x = x.astype(self.compute_dtype)
        if context is not None:
            context = context.astype(self.compute_dtype)
        if context_cross is not None:
            context_cross = context_cross.astype(self.compute_dtype)

        # --- per-attribute encoders (denoise_net.py:512-525) ---
        if self.seperate_all:
            bd = self.bbox_dim
            x_bbox = _MLPEnc(self.dim, dtype=dt, exact_gelu=self.exact_gelu, name="bbox_embedf")(x[..., :bd])
            x_class = _MLPEnc(self.dim, dtype=dt, exact_gelu=self.exact_gelu, name="class_embedf")(
                x[..., bd : bd + self.class_dim]
            )
            h_sum = x_bbox + x_class
            ofs = bd + self.class_dim
            if self.objectness_dim > 0:
                h_sum = h_sum + _MLPEnc(self.dim, dtype=dt, exact_gelu=self.exact_gelu, name="objectness_embedf")(
                    x[..., ofs : ofs + self.objectness_dim]
                )
                ofs += self.objectness_dim
            if self.objfeat_dim > 0:
                h_sum = h_sum + _MLPEnc(self.dim, dtype=dt, exact_gelu=self.exact_gelu, name="objfeat_embedf")(
                    x[..., ofs : ofs + self.objfeat_dim]
                )
            x = h_sum

        x = nn.Dense(self.dim, dtype=dt, name="init_conv")(x)
        r = x

        # --- time embedding (denoise_net.py:404-422) ---
        time_dim = self.dim * 4
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            t_emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, self.random_fourier_features, name="sinu_pos_emb"
            )(beta)
        else:
            t_emb = sinusoidal_pos_emb(beta, self.dim)
        t_emb = nn.Dense(time_dim, dtype=dt, name="time_mlp_1")(t_emb.astype(self.compute_dtype))
        t_emb = nn.Dense(time_dim, dtype=dt, name="time_mlp_2")(nn.gelu(t_emb, approximate=not self.exact_gelu))

        n_levels = len(self.dim_mults)
        dims = [self.dim * m for m in self.dim_mults]

        skips = []
        # --- down path ---
        for i in range(n_levels):
            dim_in = self.dim * (1 if i == 0 else self.dim_mults[i - 1])
            dim_out = self.dim * self.dim_mults[i]
            is_last = i == n_levels - 1
            x = ResnetBlock(dim_in, emb_dim=cond_dim, groups=groups, dtype=dt, ws_fast_vjp=self.ws_fast_vjp, weight_standardize=self.weight_standardize, ablate_norm=self.ablate_norms, name=f"down{i}_block0")(x, context)
            x = ResnetBlock(dim_in, emb_dim=time_dim, groups=groups, dtype=dt, ws_fast_vjp=self.ws_fast_vjp, weight_standardize=self.weight_standardize, ablate_norm=self.ablate_norms, name=f"down{i}_block1")(x, t_emb)
            skips.append(x)
            if self.text_condition:
                a = LinearAttentionCross(dtype=dt, name=f"down{i}_attncross")
                x = x + a(ChannelLayerNorm(name=f"down{i}_attncross_norm")(x), context_cross)
            x = ResnetBlock(dim_in, emb_dim=time_dim, groups=groups, dtype=dt, ws_fast_vjp=self.ws_fast_vjp, weight_standardize=self.weight_standardize, ablate_norm=self.ablate_norms, name=f"down{i}_block2")(x, t_emb)
            if not self.ablate_attention:  # timing-attribution ablation only
                x = x + LinearAttention(dtype=dt, name=f"down{i}_attn")(
                    ChannelLayerNorm(name=f"down{i}_attn_norm")(x)
                )
            skips.append(x)
            if is_last:
                x = nn.Dense(dim_out, dtype=dt, name=f"down{i}_proj")(x)
            # non-last levels: Downsample is identity (denoise_net.py:67-76)

        mid_dim = dims[-1]
        # --- middle (denoise_net.py:443-448) ---
        x = ResnetBlock(mid_dim, emb_dim=cond_dim, groups=groups, dtype=dt, ws_fast_vjp=self.ws_fast_vjp, weight_standardize=self.weight_standardize, ablate_norm=self.ablate_norms, name="mid_block0")(x, context)
        x = ResnetBlock(mid_dim, emb_dim=time_dim, groups=groups, dtype=dt, ws_fast_vjp=self.ws_fast_vjp, weight_standardize=self.weight_standardize, ablate_norm=self.ablate_norms, name="mid_block1")(x, t_emb)
        if self.text_condition:
            a = LinearAttentionCross(dtype=dt, name="mid_attncross")
            x = x + a(ChannelLayerNorm(name="mid_attncross_norm")(x), context_cross)
        if not self.ablate_attention:  # timing-attribution ablation only
            x = x + Attention(dtype=dt, name="mid_attn")(ChannelLayerNorm(name="mid_attn_norm")(x))
        x = ResnetBlock(mid_dim, emb_dim=time_dim, groups=groups, dtype=dt, ws_fast_vjp=self.ws_fast_vjp, weight_standardize=self.weight_standardize, ablate_norm=self.ablate_norms, name="mid_block2")(x, t_emb)

        # --- up path (denoise_net.py:450-470) ---
        for j in range(n_levels):
            i = n_levels - 1 - j  # reversed level index
            dim_in = self.dim * (1 if i == 0 else self.dim_mults[i - 1])
            dim_out = self.dim * self.dim_mults[i]
            is_last = j == n_levels - 1
            x = ResnetBlock(dim_in, emb_dim=cond_dim, groups=groups, dtype=dt, ws_fast_vjp=self.ws_fast_vjp, weight_standardize=self.weight_standardize, ablate_norm=self.ablate_norms, name=f"up{j}_block0")(x, context)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock(dim_out, emb_dim=time_dim, groups=groups, dtype=dt, ws_fast_vjp=self.ws_fast_vjp, weight_standardize=self.weight_standardize, ablate_norm=self.ablate_norms, name=f"up{j}_block1")(x, t_emb)
            if self.text_condition:
                a = LinearAttentionCross(dtype=dt, name=f"up{j}_attncross")
                x = x + a(ChannelLayerNorm(name=f"up{j}_attncross_norm")(x), context_cross)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock(dim_out, emb_dim=time_dim, groups=groups, dtype=dt, ws_fast_vjp=self.ws_fast_vjp, weight_standardize=self.weight_standardize, ablate_norm=self.ablate_norms, name=f"up{j}_block2")(x, t_emb)
            if not self.ablate_attention:  # timing-attribution ablation only
                x = x + LinearAttention(dtype=dt, name=f"up{j}_attn")(
                    ChannelLayerNorm(name=f"up{j}_attn_norm")(x)
                )
            if is_last:
                x = nn.Dense(dim_in, dtype=dt, name=f"up{j}_proj")(x)

        # --- final (denoise_net.py:573-589) ---
        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(self.dim, emb_dim=time_dim, groups=groups, dtype=dt, ws_fast_vjp=self.ws_fast_vjp, weight_standardize=self.weight_standardize, ablate_norm=self.ablate_norms, name="final_res_block")(x, t_emb)

        if self.seperate_all:
            out_bbox = _MLPDec(self.dim, self.bbox_dim, dtype=dt, exact_gelu=self.exact_gelu, name="bbox_hidden2output")(x)
            out_class = _MLPDec(self.dim, self.class_dim, dtype=dt, exact_gelu=self.exact_gelu, name="class_hidden2output")(x)
            out = jnp.concatenate([out_bbox, out_class], axis=-1)
            if self.objectness_dim > 0:
                out = jnp.concatenate(
                    [out, _MLPDec(self.dim, self.objectness_dim, dtype=dt, exact_gelu=self.exact_gelu, name="objectness_hidden2output")(x)],
                    axis=-1,
                )
            if self.objfeat_dim > 0:
                out = jnp.concatenate(
                    [out, _MLPDec(self.dim, self.objfeat_dim, dtype=dt, exact_gelu=self.exact_gelu, name="objfeat_hidden2output")(x)],
                    axis=-1,
                )
        else:
            out_dim = self.out_dim if self.out_dim is not None else self.channels
            out = nn.Dense(out_dim, dtype=dt, name="final_conv")(x)
        return out.astype(jnp.float32)
