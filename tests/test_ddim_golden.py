"""DDIM golden test vs an independent closed-form implementation.

The reference's own ddim_sample_loop (diffusion_ddpm.py:401-444) is buggy and
never called by the shipped scripts, so ours (diffusion/samplers.py) locks its
corrected semantics against a from-the-paper numpy implementation written
independently here: times = linspace(-1, T-1, steps+1) walked in reverse
pairs, eta=0 (deterministic), x_{t_next} = sqrt(a_next) x0 + sqrt(1-a_next)
eps, final step returns x0 exactly.  The denoiser is a fixed linear map so
both sides evaluate identically.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffuscene_tpu.diffusion import make_schedule
from diffuscene_tpu.diffusion.samplers import ddim_sample_loop

T = 10
SHAPE = (8, 4, 6)


def _linear_denoiser():
    rng = np.random.default_rng(7)
    W = rng.normal(0, 0.3, (SHAPE[-1], SHAPE[-1])).astype(np.float32)
    b = rng.normal(0, 0.1, (SHAPE[-1],)).astype(np.float32)
    return W, b


def _ddim_numpy(mean_type, steps, clip, x_T, W, b):
    """Independent closed-form DDIM (eta=0), float64 coefficients."""
    betas = np.linspace(1e-4, 0.02, T, dtype=np.float64)
    acp = np.cumprod(1.0 - betas)
    times = np.linspace(-1, T - 1, num=steps + 1).astype(int)[::-1]
    x = x_T.astype(np.float64)
    for time, time_next in zip(times[:-1], times[1:]):
        t_frac = time / (T - 1)
        out = x @ W.astype(np.float64) + b.astype(np.float64) * t_frac
        a = acp[time]
        if mean_type == "eps":
            eps = out
            x0 = (x - np.sqrt(1 - a) * eps) / np.sqrt(a)
            if clip:
                x0 = np.clip(x0, -1.0, 1.0)
            # eps is NOT recomputed from the clipped x0 for eps-prediction
        elif mean_type == "v":
            x0 = np.sqrt(a) * x - np.sqrt(1 - a) * out
            if clip:
                x0 = np.clip(x0, -1.0, 1.0)
            eps = (x - np.sqrt(a) * x0) / np.sqrt(1 - a)
        elif mean_type == "x0":
            x0 = np.clip(out, -1.0, 1.0) if clip else out
            eps = (x - np.sqrt(a) * x0) / np.sqrt(1 - a)
        else:
            raise AssertionError(mean_type)
        if time_next < 0:
            x = x0
        else:
            a_next = acp[time_next]
            x = np.sqrt(a_next) * x0 + np.sqrt(1 - a_next) * eps
    return x


@pytest.mark.parametrize("mean_type", ["eps", "v", "x0"])
@pytest.mark.parametrize("steps", [5, 10])
@pytest.mark.parametrize("clip", [False, True])
def test_ddim_matches_closed_form(mean_type, steps, clip):
    sched = make_schedule("linear", 1e-4, 0.02, T, model_mean_type=mean_type)
    W, b = _linear_denoiser()

    def fn(x, t):
        t_frac = t[0].astype(jnp.float32) / (T - 1)
        return x @ jnp.asarray(W) + jnp.asarray(b) * t_frac

    key = jax.random.PRNGKey(3)
    # reproduce the loop's internal x_T derivation exactly
    _, init_key = jax.random.split(key)
    x_T = np.asarray(jax.random.normal(init_key, SHAPE, dtype=jnp.float32))

    got = np.asarray(ddim_sample_loop(
        sched, mean_type, fn, SHAPE, key,
        sampling_timesteps=steps, eta=0.0, clip_denoised=clip))
    want = _ddim_numpy(mean_type, steps, clip, x_T, W, b)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
    assert np.isfinite(got).all()
