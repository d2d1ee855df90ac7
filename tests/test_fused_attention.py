"""Fused set-attention Pallas kernel vs the Flax Residual(PreNorm(Attention))."""
import jax
import jax.numpy as jnp
import numpy as np

from diffuscene_tpu.models.denoiser import Attention, ChannelLayerNorm
from diffuscene_tpu.ops.attention import fused_set_attention


def test_fused_attention_matches_flax():
    B, N, C, H, D = 3, 12, 128, 4, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.float32)

    attn = Attention(heads=H, dim_head=D)
    norm = ChannelLayerNorm()
    ap = attn.init(jax.random.PRNGKey(0), x)["params"]
    gp = norm.init(jax.random.PRNGKey(1), x)["params"]
    g = jnp.asarray(rng.normal(1, 0.2, (C,)), jnp.float32)
    gp = {"g": g}

    want = x + attn.apply({"params": ap}, norm.apply({"params": gp}, x))
    got = fused_set_attention(
        x, g, ap["to_qkv"]["kernel"], ap["to_out"]["kernel"], ap["to_out"]["bias"],
        heads=H, dim_head=D, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fused_attention_permutation_equivariance():
    B, N, C = 2, 10, 128
    rng = np.random.default_rng(1)
    x = np.asarray(rng.normal(0, 1, (B, N, C)), np.float32)
    g = np.ones(C, np.float32)
    wqkv = np.asarray(rng.normal(0, 0.05, (C, 3 * 128)), np.float32)
    wout = np.asarray(rng.normal(0, 0.05, (128, C)), np.float32)
    bout = np.zeros(C, np.float32)
    out = np.asarray(fused_set_attention(jnp.asarray(x), g, wqkv, wout, bout,
                                         compute_dtype=jnp.float32))
    perm = rng.permutation(N)
    out_p = np.asarray(fused_set_attention(jnp.asarray(x[:, perm]), g, wqkv, wout, bout,
                                           compute_dtype=jnp.float32))
    np.testing.assert_allclose(out_p, out[:, perm], atol=1e-4)
