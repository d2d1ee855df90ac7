"""Native C++ batch encoder: equivalence with the numpy pipeline + speed."""
import time

import numpy as np
import pytest

from diffuscene_tpu.data.encoding import (
    Bounds, EncodingPipeline, diffusion_encode, scale_sample,
)

native = pytest.importorskip("diffuscene_tpu.native")
if not native.native_available():
    pytest.skip("g++ unavailable or build failed", allow_module_level=True)


def _bounds():
    return Bounds(
        translations=(np.array([-3.0, 0.0, -3.0]), np.array([3.0, 4.0, 3.0])),
        sizes=(np.array([0.04, 0.04, 0.04]), np.array([2.0, 2.0, 2.0])),
        angles=(np.array(-np.pi), np.array(np.pi)),
        objfeats_32=(np.array([1.0]), np.array([-4.0]), np.array([4.0])),
    )


def _raw_scene(rng, n, n_classes=23, objfeat_dim=32):
    cls = np.zeros((n, n_classes), np.float32)
    cls[np.arange(n), rng.integers(0, n_classes - 2, n)] = 1.0
    return {
        "translations": rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32),
        "sizes": rng.uniform(0.05, 1.9, (n, 3)).astype(np.float32),
        "angles": rng.uniform(-np.pi, np.pi, (n, 1)).astype(np.float32),
        "class_labels": cls,
        "objfeats_32": rng.normal(0, 1, (n, objfeat_dim)).astype(np.float32),
    }


def _numpy_reference(samples, bounds, max_length):
    """Scale + cos/sin + objfeatsnorm + diffusion padding, NO aug/permute."""
    packed = []
    for s in samples:
        enc = scale_sample(s, bounds, cosin_angle=True, objfeats_norm=True)
        enc = diffusion_encode(enc, max_length)
        packed.append(np.concatenate(
            [enc["translations"], enc["sizes"], enc["angles"],
             enc["class_labels"], enc["objfeats_32"]], axis=-1))
    return np.stack(packed)


def test_native_matches_numpy_pipeline():
    rng = np.random.default_rng(0)
    bounds = _bounds()
    samples = [_raw_scene(rng, int(rng.integers(3, 12))) for _ in range(16)]
    enc = native.NativeBatchEncoder(
        bounds, max_length=12, n_classes=23, objfeat_dim=32,
        permute=False, rotation=None)
    got = enc(samples, seed=1)
    want = _numpy_reference(samples, bounds, 12)
    assert got.shape == want.shape == (16, 12, 62)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_native_permutation_preserves_set():
    rng = np.random.default_rng(1)
    bounds = _bounds()
    samples = [_raw_scene(rng, 8)]
    base = native.NativeBatchEncoder(bounds, 12, 23, 32, permute=False, rotation=None)
    perm = native.NativeBatchEncoder(bounds, 12, 23, 32, permute=True, rotation=None)
    a = base(samples, seed=3)[0]
    b = perm(samples, seed=3)[0]
    # same multiset of rows, different order (with overwhelming probability)
    sa = a[np.lexsort(a.T)]
    sb = b[np.lexsort(b.T)]
    np.testing.assert_allclose(sa, sb, atol=1e-6)
    # deterministic per seed
    np.testing.assert_array_equal(perm(samples, seed=3), perm(samples, seed=3))
    assert not np.array_equal(perm(samples, seed=3), perm(samples, seed=4))


def test_native_fixed_rotation_valid():
    rng = np.random.default_rng(2)
    bounds = _bounds()
    samples = [_raw_scene(rng, 6) for _ in range(8)]
    enc = native.NativeBatchEncoder(bounds, 12, 23, 32, permute=False,
                                    rotation="fixed_rotations")
    out = enc(samples, seed=5)
    # cos/sin channels stay on the unit circle
    norms = np.sqrt(out[:, :6, 6] ** 2 + out[:, :6, 7] ** 2)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # everything bounded
    assert np.abs(out).max() <= 1.0 + 1e-5


def test_native_padding():
    rng = np.random.default_rng(3)
    bounds = _bounds()
    enc = native.NativeBatchEncoder(bounds, 12, 23, 32, permute=False, rotation=None)
    out = enc([_raw_scene(rng, 3)], seed=0)[0]
    pad = out[3:]
    np.testing.assert_array_equal(pad[:, :8], 0.0)  # bbox channels zero
    np.testing.assert_array_equal(pad[:, 8 + 22:], 0.0)  # objfeats zero
    np.testing.assert_array_equal(pad[:, 8 + 22 - 1], 1.0)  # end channel +1
    np.testing.assert_array_equal(pad[:, 8 : 8 + 21], -1.0)  # other classes -1


def test_native_throughput_vs_python():
    """The native path should beat the per-sample numpy pipeline."""
    rng = np.random.default_rng(4)
    bounds = _bounds()
    samples = [_raw_scene(rng, 10) for _ in range(256)]
    enc = native.NativeBatchEncoder(bounds, 12, 23, 32, permute=True,
                                    rotation="fixed_rotations")
    enc(samples, seed=0)  # warm
    t0 = time.perf_counter()
    for i in range(5):
        enc(samples, seed=i)
    t_native = time.perf_counter() - t0

    pipeline = EncodingPipeline(
        bounds=bounds, max_length=12,
        class_labels=[f"c{i}" for i in range(22)] + ["start", "end"],
        class_frequencies={}, augmentations=("fixed_rotations",))
    t0 = time.perf_counter()
    for s in samples:
        pipeline(s)
    t_python = time.perf_counter() - t0
    print(f"native 5x256 scenes: {t_native:.4f}s, python 1x256: {t_python:.4f}s")
    assert t_native / 5 < t_python  # conservative: native batch beats python
