"""Chamfer kernel vs pure-jnp oracle — the reference unit_test.py pattern.

Mirrors `ChamferDistancePytorch/unit_test.py:14-35`: random clouds, distances
checked to tight tolerance, indices exactly, and gradients verified against
the differentiable oracle formulation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffuscene_tpu.ops import (
    chamfer_distance,
    chamfer_oracle,
    fscore,
    gather_neighbors,
    knn_indices,
)


@pytest.mark.parametrize("dim", [2, 3, 5])
def test_chamfer_matches_oracle(dim):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (4, 100, dim))
    y = jax.random.uniform(k2, (4, 120, dim))

    d1, d2, i1, i2 = jax.jit(chamfer_distance)(x, y)
    od1, od2, oi1, oi2 = chamfer_oracle(x, y)

    np.testing.assert_allclose(np.asarray(d1), np.asarray(od1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(od2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(oi1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(oi2))


def test_chamfer_reference_sizes():
    """The actual AE workload shape: 2048 input points vs 2025 recon points."""
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 2048, 3))
    y = jax.random.normal(k2, (2, 2025, 3))
    d1, d2, i1, i2 = jax.jit(chamfer_distance)(x, y)
    od1, od2, oi1, oi2 = chamfer_oracle(x, y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(od1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(od2), atol=1e-4)
    assert int(i1.max()) < 2025 and int(i2.max()) < 2048


def test_chamfer_gradients_match_oracle():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (2, 60, 3))
    y = jax.random.uniform(k2, (2, 50, 3))

    def loss_kernel(x, y):
        d1, d2, _, _ = chamfer_distance(x, y)
        return d1.mean() + d2.mean()

    def loss_oracle(x, y):
        d = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
        return d.min(2).mean() + d.min(1).mean()

    gx, gy = jax.grad(loss_kernel, argnums=(0, 1))(x, y)
    ogx, ogy = jax.grad(loss_oracle, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ogx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ogy), atol=1e-5)


def test_chamfer_identical_clouds_zero():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 3))
    d1, d2, i1, i2 = chamfer_distance(x, x)
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.arange(64)[None])


def test_fscore():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 128, 3))
    d1, d2, _, _ = chamfer_distance(x, x + 1e-4)
    f, p1, p2 = fscore(d1, d2, threshold=0.01)
    np.testing.assert_allclose(np.asarray(f), 1.0, atol=1e-6)
    # far-apart clouds -> fscore 0 without NaN
    f0, _, _ = fscore(d1 + 10.0, d2 + 10.0, threshold=0.01)
    np.testing.assert_allclose(np.asarray(f0), 0.0)


def test_knn_indices_match_bruteforce():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 96, 3))
    k = 8
    idx = knn_indices(x, k)
    d = ((x[:, :, None] - x[:, None]) ** 2).sum(-1)
    # compare neighbor distance sets (ties can permute indices)
    got = np.sort(np.take_along_axis(np.asarray(d), np.asarray(idx), axis=2), axis=-1)
    want = np.sort(np.asarray(d), axis=-1)[:, :, :k]
    np.testing.assert_allclose(got, want, atol=1e-5)
    # self is always among the neighbors (distance 0)
    assert (got[:, :, 0] < 1e-6).all()


def test_knn_chunked_matches_unchunked():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 100, 4))
    a = knn_indices(x, 5)
    b = knn_indices(x, 5, chunk=32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gather_neighbors():
    x = jnp.arange(2 * 6 * 3, dtype=jnp.float32).reshape(2, 6, 3)
    idx = jnp.array([[[0, 1], [2, 3], [4, 5], [0, 0], [1, 1], [2, 2]]] * 2, jnp.int32)
    out = gather_neighbors(x, idx)
    assert out.shape == (2, 6, 2, 3)
    np.testing.assert_array_equal(np.asarray(out[0, 0, 1]), np.asarray(x[0, 1]))
