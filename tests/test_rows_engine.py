"""End-to-end parity: the flat-row engine with whole-level Pallas chains
(fused="rows") vs the 3-D serving engine (fused=True), which is itself
parity-tested against the Flax denoiser (tests/test_fused_engine.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig


def _scene(dim=64, class_dim=22, N=12, time_num=6, text=False, dtype="bf16"):
    nk = dict(
        dim=dim, dim_mults=(1, 1, 1, 1), channels=62, objectness_dim=0,
        class_dim=class_dim, angle_dim=2, objfeat_dim=32, context_dim=0,
        instanclass_dim=32, seperate_all=True,
        compute_dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
    )
    kw = {}
    if text:
        nk["text_condition"] = True
        nk["text_dim"] = 24
        kw["text_condition"] = True
        kw["text_embed_dim"] = 24
    cfg = SceneModelConfig(
        point_dim=62, class_dim=class_dim, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=N, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=32,
        model_mean_type="v", model_var_type="fixedsmall",
        schedule_type="linear", beta_start=1e-4, beta_end=0.02, time_num=time_num,
        loss_separate=True, loss_iou=False,
        net_kwargs=tuple(sorted(nk.items())), **kw,
    )
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0), batch_size=2)
    return scene, params


def _compare_step(scene, params, B=8, text=False, atol=1.5e-1, mode="rows"):
    """One denoiser forward, identical inputs, rows vs 3-D engine."""
    from diffuscene_tpu.models.scene_model import SceneNetworks

    N, D = scene.cfg.sample_num_points, scene.cfg.point_dim
    kw = {}
    if text:
        kw["text_emb"] = jax.random.normal(jax.random.PRNGKey(5), (B, 4, 768))
    condition, condition_cross = scene.net.apply(
        params, B, N, method=SceneNetworks.make_condition, **kw)
    fn3 = scene._denoise_fn(params, condition, condition_cross, fused=True)
    fnr = scene._denoise_fn(params, condition, condition_cross, fused=mode)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.float32)
    t = jnp.arange(B, dtype=jnp.int32) % scene.sched.num_timesteps
    o3 = np.asarray(jax.jit(fn3)(x, t))
    orows = np.asarray(jax.jit(fnr)(x, t))
    assert orows.shape == o3.shape
    # bf16: rounding differences accumulate through 19 resblocks (the
    # chain kernel expands GN affines via one-hot matmuls, the 3-D engine
    # via broadcasts); semantics are pinned by the f32 test at 2e-4
    np.testing.assert_allclose(orows, o3, atol=atol, rtol=1.0)


def test_rows_forward_parity_uncond():
    scene, params = _scene()
    _compare_step(scene, params)


def test_rows_forward_parity_f32_exact():
    scene, params = _scene(dtype="f32")
    _compare_step(scene, params, atol=2e-4)


def test_rows_xla_forward_parity_f32_exact():
    scene, params = _scene(dtype="f32")
    _compare_step(scene, params, atol=2e-4, mode="rows_xla")


def test_rows_xla_forward_parity_text_bf16():
    scene, params = _scene(text=True)
    _compare_step(scene, params, text=True, mode="rows_xla")


def test_rows_forward_parity_text():
    scene, params = _scene(text=True)
    _compare_step(scene, params, text=True)


def test_rows_forward_parity_livingroom():
    scene, params = _scene(class_dim=25, N=21)
    _compare_step(scene, params, B=16)


def test_rows_sampling_chain_matches_engine():
    scene, params = _scene(time_num=5)
    B = 8
    key = jax.random.PRNGKey(7)
    s3 = jax.jit(lambda p, k: scene.sample(p, k, batch_size=B, clip_denoised=True,
                                           fused=True))(params, key)
    sr = jax.jit(lambda p, k: scene.sample(p, k, batch_size=B, clip_denoised=True,
                                           fused="rows"))(params, key)
    # same PRNG stream -> chains differ only by engine rounding
    np.testing.assert_allclose(np.asarray(sr), np.asarray(s3), atol=8e-2, rtol=8e-2)


def test_rows_falls_back_on_unequal_dims():
    """dim_mults (1, 2) is outside the chain kernel's coverage; fused="rows"
    must silently fall back to the 3-D engine, not crash."""
    nk = dict(
        dim=32, dim_mults=(1, 2), channels=62, objectness_dim=0,
        class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
        instanclass_dim=32, seperate_all=True, compute_dtype=jnp.float32,
    )
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=32,
        model_mean_type="v", model_var_type="fixedsmall",
        schedule_type="linear", beta_start=1e-4, beta_end=0.02, time_num=4,
        loss_separate=True, loss_iou=False, net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0), batch_size=2)
    out = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, fused="rows"))(
        params, jax.random.PRNGKey(1))
    assert out.shape == (8, 12, 62)
