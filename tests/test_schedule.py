"""Golden-value tests for the diffusion schedule & q/p math.

Oracle strategy (SURVEY.md §4): closed-form / independent numpy recomputation
of every coefficient, plus algebraic identities of the parameterizations.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuscene_tpu.diffusion import (
    AttributeSpec,
    LossConfig,
    make_schedule,
    get_betas,
    model_predictions,
    predict_eps_from_xstart,
    predict_v,
    predict_xstart_from_eps,
    predict_xstart_from_v,
    q_posterior_mean_variance,
    q_sample,
)


def test_linear_betas_match_numpy():
    betas = get_betas("linear", 1e-4, 0.02, 1000)
    ref = np.linspace(1e-4, 0.02, 1000)
    np.testing.assert_allclose(betas, ref, rtol=0, atol=0)


def test_warm_betas():
    betas = get_betas("warm0.1", 1e-4, 0.02, 1000)
    assert betas.shape == (1000,)
    assert betas[100] == 0.02 and betas[0] == 1e-4
    np.testing.assert_allclose(betas[:100], np.linspace(1e-4, 0.02, 100))


def test_cosine_betas_monotone_alphabar():
    betas = get_betas("cosine", 1e-4, 0.02, 1000)
    a_bar = np.cumprod(1 - betas)
    assert (np.diff(a_bar) < 0).all()
    assert betas.max() <= 0.999


def test_schedule_coefficients_float64_precision():
    sched = make_schedule("linear", 1e-4, 0.02, 1000, model_mean_type="v")
    betas = np.linspace(1e-4, 0.02, 1000)
    a_bar = np.cumprod(1 - betas)
    a_bar_prev = np.append(1.0, a_bar[:-1])
    np.testing.assert_allclose(sched.alphas_cumprod, a_bar, rtol=1e-6)
    np.testing.assert_allclose(sched.sqrt_alphas_cumprod, np.sqrt(a_bar), rtol=1e-6)
    post_var = betas * (1 - a_bar_prev) / (1 - a_bar)
    np.testing.assert_allclose(sched.posterior_variance, post_var, rtol=1e-5)
    np.testing.assert_allclose(
        sched.posterior_log_variance_clipped,
        np.log(np.maximum(post_var, 1e-20)),
        rtol=1e-5,
    )
    snr = a_bar / (1 - a_bar)
    np.testing.assert_allclose(sched.loss_weight, snr / (snr + 1), rtol=1e-5)


def test_loss_weight_eps_and_x0():
    s_eps = make_schedule(model_mean_type="eps")
    assert np.allclose(s_eps.loss_weight, 1.0)
    s_x0 = make_schedule(model_mean_type="x0")
    a_bar = np.cumprod(1 - np.linspace(1e-4, 0.02, 1000))
    np.testing.assert_allclose(s_x0.loss_weight, a_bar / (1 - a_bar), rtol=1e-4)


def test_parameterization_roundtrips():
    sched = make_schedule()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (4, 12, 62))
    eps = jax.random.normal(k2, (4, 12, 62))
    t = jax.random.randint(k3, (4,), 0, 1000)

    x_t = q_sample(sched, x0, t, eps)
    # eps -> x0 inversion
    x0_rec = predict_xstart_from_eps(sched, x_t, t, eps)
    np.testing.assert_allclose(x0_rec, x0, atol=2e-4)
    # x0 -> eps inversion
    eps_rec = predict_eps_from_xstart(sched, x_t, t, x0)
    np.testing.assert_allclose(eps_rec, eps, atol=2e-3)
    # v round trip
    v = predict_v(sched, x0, t, eps)
    x0_from_v = predict_xstart_from_v(sched, x_t, t, v)
    np.testing.assert_allclose(x0_from_v, x0, atol=2e-4)


def test_model_predictions_consistency():
    sched = make_schedule()
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (2, 12, 8))
    eps = jax.random.normal(k2, (2, 12, 8))
    t = jnp.array([10, 500])
    x_t = q_sample(sched, x0, t, eps)

    v = predict_v(sched, x0, t, eps)
    pred = model_predictions(sched, "v", v, x_t, t)
    np.testing.assert_allclose(pred.pred_x_start, x0, atol=2e-4)
    np.testing.assert_allclose(pred.pred_noise, eps, atol=5e-3)

    pred_eps = model_predictions(sched, "eps", eps, x_t, t)
    np.testing.assert_allclose(pred_eps.pred_x_start, x0, atol=2e-4)

    pred_x0 = model_predictions(sched, "x0", x0, x_t, t)
    np.testing.assert_allclose(pred_x0.pred_noise, eps, atol=5e-3)


def test_q_posterior_at_t0_is_x0():
    # posterior_mean_coef1[0] = beta_0 * sqrt(a_bar_prev=1)/(1-a_bar_0) = 1
    sched = make_schedule()
    x0 = jnp.ones((2, 3, 4)) * 0.5
    x_t = jnp.ones((2, 3, 4)) * -0.7
    t = jnp.zeros((2,), jnp.int32)
    mean, var, _ = q_posterior_mean_variance(sched, x0, x_t, t)
    np.testing.assert_allclose(mean, x0, atol=1e-5)
    np.testing.assert_allclose(var, 0.0, atol=1e-12)
