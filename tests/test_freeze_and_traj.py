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
    # 1 initial frame + T/freq frames
    assert frames.shape == (1 + 4, 2, 4, 6)
    assert np.isfinite(np.asarray(frames)).all()
