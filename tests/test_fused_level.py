"""Parity tests for the whole-level resblock-chain Pallas kernel
(ops/fused_level.py) against the serving engine's XLA `_resblock`
(models/inference.py), which is itself parity-tested against the Flax
denoiser (tests/test_fused_engine.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffuscene_tpu.models.inference import _resblock
from diffuscene_tpu.ops.fused_level import (
    ChainBlock, apply_chain, build_chain,
)

GROUPS = 8


def _mk_block_params(key, c_in, c_out, res_proj, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 8)
    sc = 1.0 / np.sqrt(c_in)
    p = {
        "block1": {
            "proj": {"kernel": (jax.random.normal(ks[0], (c_in, c_out)) * sc).astype(dtype),
                     "bias": (jax.random.normal(ks[1], (c_out,)) * 0.1).astype(dtype)},
            "norm": {"scale": jnp.asarray(1.0 + 0.1 * jax.random.normal(ks[2], (c_out,)), jnp.float32),
                     "bias": jnp.asarray(0.1 * jax.random.normal(ks[3], (c_out,)), jnp.float32)},
        },
        "block2": {
            "proj": {"kernel": (jax.random.normal(ks[4], (c_out, c_out)) / np.sqrt(c_out)).astype(dtype),
                     "bias": (jax.random.normal(ks[5], (c_out,)) * 0.1).astype(dtype)},
            "norm": {"scale": jnp.asarray(1.0 + 0.1 * jax.random.normal(ks[6], (c_out,)), jnp.float32),
                     "bias": jnp.asarray(0.1 * jax.random.normal(ks[7], (c_out,)), jnp.float32)},
        },
    }
    if res_proj:
        kr = jax.random.split(ks[0], 2)
        p["res_conv"] = {
            "kernel": (jax.random.normal(kr[0], (c_in, c_out)) * sc).astype(dtype),
            "bias": (jax.random.normal(kr[1], (c_out,)) * 0.1).astype(dtype),
        }
    return p


def _chain_weights_from(p, c, has_skip):
    """Translate an engine _resblock param dict into build_chain's dict."""
    k1 = p["block1"]["proj"]["kernel"]
    wd = {
        "b1": p["block1"]["proj"]["bias"],
        "gn1_scale": p["block1"]["norm"]["scale"],
        "gn1_bias": p["block1"]["norm"]["bias"],
        "w2": p["block2"]["proj"]["kernel"],
        "b2": p["block2"]["proj"]["bias"],
        "gn2_scale": p["block2"]["norm"]["scale"],
        "gn2_bias": p["block2"]["norm"]["bias"],
    }
    if has_skip:
        wd["w1"], wd["w1s"] = k1[:c], k1[c:]
    else:
        wd["w1"] = k1
    if "res_conv" in p:
        kr = p["res_conv"]["kernel"]
        wd["bres"] = p["res_conv"]["bias"]
        if has_skip:
            wd["wres"], wd["wres_s"] = kr[:c], kr[c:]
        else:
            wd["wres"] = kr
    return wd


def _run_case(B=8, N=12, C=64, film_kind="none", has_skip=False, res_proj=None,
              dtype=jnp.bfloat16, nblocks=1, tile_scenes=4, seed=0):
    if res_proj is None:
        res_proj = has_skip
    key = jax.random.PRNGKey(seed)
    kx, kf, ks, kp = jax.random.split(key, 4)
    x3 = (jax.random.normal(kx, (B, N, C)) * 0.5).astype(dtype)
    blocks, weights, films, skips, plist = [], [], [], [], []
    skip3 = None
    for i in range(nblocks):
        kp, kpi = jax.random.split(kp)
        c_in = 2 * C if has_skip else C
        p = _mk_block_params(kpi, c_in, C, res_proj, dtype=dtype)
        plist.append(p)
        blocks.append(ChainBlock(has_skip=has_skip, film=film_kind,
                                 has_res_proj=res_proj))
        weights.append(_chain_weights_from(p, C, has_skip))
        if film_kind == "scene":
            kf, kfi = jax.random.split(kf)
            films.append((jax.random.normal(kfi, (B, 2 * C)) * 0.2).astype(dtype))
        elif film_kind == "row":
            kf, kfi = jax.random.split(kf)
            films.append((jax.random.normal(kfi, (B * N, 2 * C)) * 0.2).astype(dtype))
        else:
            films.append(None)
        if has_skip:
            ks, ksi = jax.random.split(ks)
            skip3 = (jax.random.normal(ksi, (B, N, C)) * 0.5).astype(dtype)
            skips.append(skip3.reshape(B * N, C))
        else:
            skips.append(None)

    # engine reference: sequential 3-D _resblocks
    h_ref = x3
    for i, p in enumerate(plist):
        if film_kind == "scene":
            film = films[i].reshape(B, 1, 2 * C)
        elif film_kind == "row":
            film = films[i].reshape(B, N, 2 * C)
        else:
            film = None
        h_ref = _resblock(p, h_ref, film, dtype, groups=GROUPS,
                          skip=skip3 if has_skip else None)

    chain = build_chain(blocks, weights, compute_dtype=dtype)
    out = apply_chain(chain, x3.reshape(B * N, C), films, skips,
                      n_per_scene=N, groups=GROUPS, tile_scenes=tile_scenes)
    return np.asarray(h_ref, np.float32).reshape(B * N, C), np.asarray(out, np.float32)


@pytest.mark.parametrize("film_kind", ["none", "scene", "row"])
def test_single_block_film_variants(film_kind):
    ref, out = _run_case(film_kind=film_kind)
    np.testing.assert_allclose(out, ref, atol=5e-2, rtol=5e-2)


def test_single_block_res_proj():
    ref, out = _run_case(res_proj=True)
    np.testing.assert_allclose(out, ref, atol=5e-2, rtol=5e-2)


def test_skip_block_split_matmuls():
    ref, out = _run_case(has_skip=True, film_kind="scene")
    np.testing.assert_allclose(out, ref, atol=5e-2, rtol=5e-2)


def test_two_block_chain():
    ref, out = _run_case(nblocks=2, film_kind="scene")
    np.testing.assert_allclose(out, ref, atol=8e-2, rtol=8e-2)


def test_f32_exact():
    ref, out = _run_case(dtype=jnp.float32, film_kind="scene", nblocks=2)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_livingroom_scene_size():
    # N=21 rows per scene: tile must fall back to sublane-aligned scene tiles
    ref, out = _run_case(B=16, N=21, film_kind="scene", tile_scenes=16)
    np.testing.assert_allclose(out, ref, atol=5e-2, rtol=5e-2)


def test_mixed_chain_cond_then_time():
    """down-level pattern: block0 (cond row film) -> block1 (time scene film)."""
    B, N, C = 8, 12, 64
    key = jax.random.PRNGKey(3)
    kx, k1, k2, kf1, kf2 = jax.random.split(key, 5)
    dtype = jnp.bfloat16
    x3 = (jax.random.normal(kx, (B, N, C)) * 0.5).astype(dtype)
    p0 = _mk_block_params(k1, C, C, False, dtype)
    p1 = _mk_block_params(k2, C, C, False, dtype)
    film_row = (jax.random.normal(kf1, (B * N, 2 * C)) * 0.2).astype(dtype)
    film_sc = (jax.random.normal(kf2, (B, 2 * C)) * 0.2).astype(dtype)

    h_ref = _resblock(p0, x3, film_row.reshape(B, N, 2 * C), dtype, groups=GROUPS)
    h_ref = _resblock(p1, h_ref, film_sc.reshape(B, 1, 2 * C), dtype, groups=GROUPS)

    blocks = [ChainBlock(film="row"), ChainBlock(film="scene")]
    weights = [_chain_weights_from(p0, C, False), _chain_weights_from(p1, C, False)]
    chain = build_chain(blocks, weights, compute_dtype=dtype)
    out = apply_chain(chain, x3.reshape(B * N, C), [film_row, film_sc],
                      [None, None], n_per_scene=N, groups=GROUPS, tile_scenes=4)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(h_ref, np.float32).reshape(B * N, C),
                               atol=8e-2, rtol=8e-2)
