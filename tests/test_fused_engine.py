"""Fused inference engine vs Flax Unet1D parity (interpreter-mode Pallas on
CPU), plus the fused end-to-end sample path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig, Unet1D
from diffuscene_tpu.models.inference import (
    fused_unet1d_forward, prepare_inference_params,
)
from diffuscene_tpu.ops.fused_resblock import fused_resnet_block, standardize_kernel


def test_fused_resblock_matches_flax_block():
    """One fused kernel vs the Flax ResnetBlock on identical params."""
    from diffuscene_tpu.models.denoiser import ResnetBlock

    B, N, C = 2, 12, 64
    M = B * N
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.float32)
    emb = jnp.asarray(rng.normal(0, 1, (B, N, 48)), jnp.float32)

    block = ResnetBlock(C, emb_dim=48, groups=8)
    params = block.init(jax.random.PRNGKey(0), x, emb)["params"]
    want = block.apply({"params": params}, x, emb)

    p = jax.tree.map(lambda a: a, params)
    film = jnp.dot(jax.nn.silu(emb.reshape(M, -1)), p["mlp"]["kernel"]) + p["mlp"]["bias"]
    got = fused_resnet_block(
        x.reshape(M, C), film,
        w1=standardize_kernel(p["block1"]["proj"]["kernel"]),
        b1=p["block1"]["proj"]["bias"],
        gn1_scale=p["block1"]["norm"]["scale"], gn1_bias=p["block1"]["norm"]["bias"],
        w2=standardize_kernel(p["block2"]["proj"]["kernel"]),
        b2=p["block2"]["proj"]["bias"],
        gn2_scale=p["block2"]["norm"]["scale"], gn2_bias=p["block2"]["norm"]["bias"],
        n_per_scene=N,
        compute_dtype=jnp.float32,
    ).reshape(B, N, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_resblock_res_proj():
    """C_in != C_out path (up-blocks after skip concat)."""
    from diffuscene_tpu.models.denoiser import ResnetBlock

    B, N, Cin, C = 2, 8, 48, 24
    M = B * N
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, N, Cin)), jnp.float32)
    emb = jnp.asarray(rng.normal(0, 1, (B, N, 16)), jnp.float32)
    block = ResnetBlock(C, emb_dim=16, groups=8)
    params = block.init(jax.random.PRNGKey(0), x, emb)["params"]
    want = block.apply({"params": params}, x, emb)
    film = jnp.dot(jax.nn.silu(emb.reshape(M, -1)), params["mlp"]["kernel"]) + params["mlp"]["bias"]
    got = fused_resnet_block(
        x.reshape(M, Cin), film,
        w1=standardize_kernel(params["block1"]["proj"]["kernel"]),
        b1=params["block1"]["proj"]["bias"],
        gn1_scale=params["block1"]["norm"]["scale"], gn1_bias=params["block1"]["norm"]["bias"],
        w2=standardize_kernel(params["block2"]["proj"]["kernel"]),
        b2=params["block2"]["proj"]["bias"],
        gn2_scale=params["block2"]["norm"]["scale"], gn2_bias=params["block2"]["norm"]["bias"],
        w_res=params["res_conv"]["kernel"],
        b_res=params["res_conv"]["bias"],
        n_per_scene=N,
        compute_dtype=jnp.float32,
    ).reshape(B, N, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("text", [False, True])
@pytest.mark.parametrize("exact_gelu", [True, False])
def test_fused_forward_matches_flax(text, exact_gelu):
    net = Unet1D(
        dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0, class_dim=22,
        translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
        context_dim=0, instanclass_dim=16, seperate_all=True,
        text_condition=text, text_dim=24, compute_dtype=jnp.float32,
    )
    B, N, D = 2, 12, 62
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jnp.asarray(rng.normal(0, 1, (B, N, 16)), jnp.float32)
    cc = jnp.asarray(rng.normal(0, 1, (B, 10, 24)), jnp.float32) if text else None

    variables = net.init(jax.random.PRNGKey(0), x, t, ctx, cc)
    want = net.apply(variables, x, t, ctx, cc)
    inf = prepare_inference_params(net, variables["params"], num_timesteps=16)
    got = fused_unet1d_forward(net, inf, x, t, ctx, cc, exact_gelu=exact_gelu)
    if exact_gelu:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3)
    else:
        # serving default: tanh-approx GELU deviates by <= ~3e-3 per forward
        # (below bf16 rounding at these magnitudes)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-2, rtol=5e-2)


def test_fused_sample_path():
    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
              instanclass_dim=16, seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", time_num=6, net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0))
    ref = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, clip_denoised=True))(
        params, jax.random.PRNGKey(1))
    fused = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, clip_denoised=True,
                                              fused=True))(params, jax.random.PRNGKey(1))
    assert fused.shape == ref.shape == (8, 12, 62)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-3, rtol=1e-2)


def _tiny_scene(time_num=6):
    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
              instanclass_dim=16, seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", time_num=time_num, net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    return scene, scene.init(jax.random.PRNGKey(0))


def test_fused_ddim_matches_flax():
    """DDIM walks a strided timestep subsequence — exercises the FiLM-table
    gather at non-contiguous t values."""
    scene, params = _tiny_scene(time_num=8)
    ref = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, clip_denoised=True,
                                            ddim=True, ddim_steps=4))(
        params, jax.random.PRNGKey(1))
    fused = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, clip_denoised=True,
                                              ddim=True, ddim_steps=4, fused=True))(
        params, jax.random.PRNGKey(1))
    assert fused.shape == ref.shape == (8, 12, 62)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-3, rtol=1e-2)


def test_fused_trajectory_matches_flax():
    scene, params = _tiny_scene(time_num=6)
    ref = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, clip_denoised=True,
                                            ret_traj=True, freq=3))(
        params, jax.random.PRNGKey(1))
    fused = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, clip_denoised=True,
                                              ret_traj=True, freq=3, fused=True))(
        params, jax.random.PRNGKey(1))
    # T=6, freq=3: init + post-(t=T-1) + T/freq modulo frames (reference-exact)
    assert fused.shape == ref.shape == (4, 8, 12, 62)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-3, rtol=1e-2)


def test_fused_forward_nondefault_groups():
    """resnet_block_groups != 8 must flow into the engine's GroupNorm."""
    net = Unet1D(
        dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0, class_dim=22,
        translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
        context_dim=0, instanclass_dim=16, seperate_all=True,
        resnet_block_groups=4, compute_dtype=jnp.float32,
    )
    B, N, D = 2, 12, 62
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.float32)
    t = jnp.array([1, 5], jnp.int32)
    ctx = jnp.asarray(rng.normal(0, 1, (B, N, 16)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, t, ctx)
    want = net.apply(variables, x, t, ctx)
    inf = prepare_inference_params(net, variables["params"], num_timesteps=8)
    got = fused_unet1d_forward(net, inf, x, t, ctx, exact_gelu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3)


def test_fused_sample_unconditioned():
    """No instance/room conditioning at all: the Unet1D has no cond-FiLM
    mlps and the engine must run those blocks FiLM-free (like Unet1D with
    emb None)."""
    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
              instanclass_dim=0, seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=False, learnable_embedding=False, instance_emb_dim=0,
        model_mean_type="v", time_num=6, net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0))
    ref = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, clip_denoised=True))(
        params, jax.random.PRNGKey(1))
    fused = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, clip_denoised=True,
                                              fused=True))(params, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-3, rtol=1e-2)


def test_fused_forward_nonunit_dim_mults():
    """dim_mults=(1,2): the up-path concat width equals the block width, so
    ResnetBlock has no res_conv and the residual must be the full concat
    (regression: the engine used only the first half)."""
    net = Unet1D(
        dim=32, dim_mults=(1, 2), channels=62, objectness_dim=0, class_dim=22,
        translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
        context_dim=0, instanclass_dim=16, seperate_all=True,
        compute_dtype=jnp.float32,
    )
    B, N, D = 2, 12, 62
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jnp.asarray(rng.normal(0, 1, (B, N, 16)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, t, ctx)
    want = net.apply(variables, x, t, ctx)
    inf = prepare_inference_params(net, variables["params"], num_timesteps=8)
    got = fused_unet1d_forward(net, inf, x, t, ctx, exact_gelu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3)
