"""Freeze-mask optimizer wrapper + trajectory sampler shape checks."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffuscene_tpu.diffusion import make_schedule
from diffuscene_tpu.diffusion.samplers import p_sample_loop_trajectory
from diffuscene_tpu.train import freeze_mask


def test_freeze_mask_zeroes_frozen_subtree():
    params = {"params": {"feature_extractor": {"w": jnp.ones(3)},
                         "denoiser": {"w": jnp.ones(3)}}}
    tx = optax.chain(freeze_mask(params, ("feature_extractor",)), optax.sgd(1.0))
    st = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, st, params)
    np.testing.assert_array_equal(
        np.asarray(updates["params"]["feature_extractor"]["w"]), 0.0)
    assert float(np.abs(updates["params"]["denoiser"]["w"]).sum()) > 0


def test_trajectory_sampler_frames():
    sched = make_schedule("linear", 1e-4, 0.02, 8, model_mean_type="eps")
    fn = lambda x, t: jnp.zeros_like(x)
    frames = p_sample_loop_trajectory(
        sched, "eps", "fixedsmall", fn, (2, 4, 6), jax.random.PRNGKey(0), freq=2)
    # init + post-(t=T-1) frame + T/freq modulo frames (reference
    # diffusion_ddpm.py:396 emits when t % freq == 0 OR t == T-1)
    assert frames.shape == (2 + 4, 2, 4, 6)
    assert np.isfinite(np.asarray(frames)).all()

    frames1 = p_sample_loop_trajectory(
        sched, "eps", "fixedsmall", fn, (2, 4, 6), jax.random.PRNGKey(0), freq=1)
    # freq=1: the t==T-1 frame coincides with the modulo frames
    assert frames1.shape == (1 + 8, 2, 4, 6)


def test_dpm_solver_sampling():
    """DPM-Solver++(2M): runs as one scan, deterministic per key, and both
    plain and fused engines agree."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig

    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
              instanclass_dim=16, seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", time_num=12, net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0))
    f = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, clip_denoised=True,
                                          dpm=True, dpm_steps=6))
    out = f(params, jax.random.PRNGKey(1))
    assert out.shape == (8, 12, 62)
    assert np.isfinite(np.asarray(out)).all()
    out2 = f(params, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    fused = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, clip_denoised=True,
                                              dpm=True, dpm_steps=6, fused=True))(
        params, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(out), atol=5e-3, rtol=1e-2)
    # with the lower-order final step the last update returns the clamped x0
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-5
    # oversampling the schedule (duplicate integer timesteps -> h == 0 steps)
    # must stay finite (regression: 0 * inf = NaN in the 2M correction)
    over = jax.jit(lambda p, k: scene.sample(p, k, batch_size=8, dpm=True,
                                             dpm_steps=20))(params, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(over)).all()
