"""Shape-autoencoder tests: shapes, KL math, one jitted train step.

Mirrors the reference smoke test (`foldingnet_autoencoder.py:424-441`) plus
golden-value checks on the KL closed form.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffuscene_tpu.models import KLAutoEncoder
from diffuscene_tpu.models.autoencoder import (
    diagonal_gaussian_kl,
    folding_grid,
)
from diffuscene_tpu.train import AETrainer

N_PTS = 256  # small point count for CPU tests; reference trains with 2048


def test_folding_grid():
    g = folding_grid(45, 0.3)
    assert g.shape == (2025, 2)
    assert g.min() == -0.3 and g.max() == 0.3


def test_kl_closed_form():
    # KL(N(0,1) || N(0,1)) == 0
    mean = jnp.zeros((3, 8))
    logvar = jnp.zeros((3, 8))
    np.testing.assert_allclose(np.asarray(diagonal_gaussian_kl(mean, logvar)), 0.0, atol=1e-7)
    # KL(N(mu, 1) || N(0,1)) == mean(mu^2)/2 over latent dim
    mean = jnp.ones((2, 4)) * 2.0
    got = diagonal_gaussian_kl(mean, jnp.zeros((2, 4)))
    np.testing.assert_allclose(np.asarray(got), 2.0, atol=1e-6)


def test_klautoencoder_forward_shapes():
    model = KLAutoEncoder(latent_dim=32)
    pc = jax.random.normal(jax.random.PRNGKey(0), (2, N_PTS, 3))
    variables = model.init({"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)}, pc)
    kl, lat, recon = model.apply(variables, pc, rngs={"sample": jax.random.PRNGKey(3)})
    assert kl.shape == (2,)
    assert lat.shape == (2, 32)
    assert recon.shape == (2, 2025, 3)
    # deterministic encode returns the mean
    kl1, lat1 = model.apply(variables, pc, deterministic=True, method=KLAutoEncoder.encode)
    kl2, lat2 = model.apply(variables, pc, deterministic=True, method=KLAutoEncoder.encode)
    np.testing.assert_array_equal(np.asarray(lat1), np.asarray(lat2))


def test_ae_train_step_decreases_loss():
    model = KLAutoEncoder(latent_dim=16, kl_weight=0.001)
    # lr 1e-4 matches the reference AE recipe (obj_autoencoder yaml:34-58)
    trainer = AETrainer(
        model,
        {"optimizer": "Adam", "lr": 1e-4, "schedule": "step", "lr_step": 100000,
         "lr_decay": 0.5, "max_grad_norm": 10.0},
        n_points=N_PTS,
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch_size=2)
    rng = np.random.default_rng(0)
    pc = trainer.put_batch(rng.normal(0, 0.3, (8, N_PTS, 3)))
    key = jax.random.PRNGKey(1)
    state, m0 = trainer.train_step(state, pc, key)
    losses = []
    for _ in range(15):
        state, m = trainer.train_step(state, pc, key)
        losses.append(float(m["loss"]))
    assert min(losses[-5:]) < float(m0["loss"])
    assert np.isfinite(float(m["loss.cd"])) and np.isfinite(float(m["loss.kl"]))
    # eval + encode paths run
    em = trainer.eval_step(state, pc, key)
    assert np.isfinite(float(em["loss"]))
    lat = trainer.encode(state, pc)
    assert lat.shape == (8, 16)
