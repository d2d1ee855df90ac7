"""Improved Precision & Recall (Kynkäänniemi et al. 2019) over render features.

Equivalent of `scripts/improved_precision_recall.py` (IPR class, lines
51-199; metric math at 202-300): build the k-NN radius manifold of each
feature set (k=3, 5000 samples in the reference defaults) and measure

  precision = fraction of fake samples inside the real manifold
  recall    = fraction of real samples inside the fake manifold

where "inside" means distance to some reference sample <= that sample's
k-th-nearest-neighbor radius.  The reference uses VGG16-fc2 features; the
extractor is pluggable here (see `eval/fid.py` for the options and why).

The pairwise-distance sweep is the hot path; it is formulated as
||x||^2 + ||y||^2 - 2 x.yT so it rides the MXU under jit when run on TPU.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np


class PrecisionRecall(NamedTuple):
    precision: float
    recall: float


def pairwise_distances(x: np.ndarray, y: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """(N, D), (M, D) -> (N, M) euclidean distances, chunked over rows."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    yy = (y * y).sum(1)
    out = np.empty((x.shape[0], y.shape[0]), np.float64)
    for i in range(0, x.shape[0], chunk):
        xc = x[i : i + chunk]
        d2 = (xc * xc).sum(1)[:, None] + yy[None, :] - 2.0 * xc @ y.T
        out[i : i + chunk] = np.sqrt(np.clip(d2, 0.0, None))
    return out


def knn_radii(feats: np.ndarray, k: int = 3) -> np.ndarray:
    """Distance to the k-th nearest neighbor (excluding self) per sample.

    (improved_precision_recall.py: manifold radii with k=3.)
    """
    d = pairwise_distances(feats, feats)
    # column 0 is self (distance 0); k-th neighbor is at sorted index k
    return np.sort(d, axis=1)[:, k]


def _fraction_inside(subjects: np.ndarray, refs: np.ndarray, radii: np.ndarray) -> float:
    d = pairwise_distances(subjects, refs)
    inside = (d <= radii[None, :]).any(axis=1)
    return float(inside.mean())


def subsample_features(feats: np.ndarray, num_samples: Optional[int],
                       rng: np.random.Generator) -> np.ndarray:
    """Uniform without-replacement subsample to at most ``num_samples`` rows
    (the reference caps both manifolds at --num_samples=5000,
    improved_precision_recall.py:377-379)."""
    if num_samples is not None and len(feats) > num_samples:
        return feats[rng.choice(len(feats), num_samples, replace=False)]
    return feats


def save_manifold(path: str, feats: np.ndarray, k: int = 3):
    """Persist a precalculated reference manifold (features + k-NN radii),
    the reference's --fname_precalc / IPR.save_ref
    (improved_precision_recall.py:381,463-467)."""
    # native dtype (no cast) so a reloaded manifold reproduces the
    # folder-based precision/recall bit-exactly
    np.savez(path if path.endswith(".npz") else path + ".npz",
             feats=np.asarray(feats),
             radii=np.asarray(knn_radii(feats, k)),
             k=np.int64(k))


def load_manifold(path: str):
    """(feats, radii, k) from a save_manifold npz — accepted anywhere the
    reference accepts a precalculated .npz as path_real
    (improved_precision_recall.py:106)."""
    d = np.load(path)
    return d["feats"], d["radii"], int(d["k"])


def compute_precision_recall(
    real_feats: np.ndarray,
    fake_feats: np.ndarray,
    k: int = 3,
    num_samples: Optional[int] = 5000,
    seed: int = 0,
) -> PrecisionRecall:
    """IPR over two feature sets (improved_precision_recall.py:256-300)."""
    rng = np.random.default_rng(seed)
    real_feats = subsample_features(real_feats, num_samples, rng)
    fake_feats = subsample_features(fake_feats, num_samples, rng)
    real_radii = knn_radii(real_feats, k)
    fake_radii = knn_radii(fake_feats, k)
    precision = _fraction_inside(fake_feats, real_feats, real_radii)
    recall = _fraction_inside(real_feats, fake_feats, fake_radii)
    return PrecisionRecall(precision, recall)


def realism(real_feats: np.ndarray, real_radii: np.ndarray,
            subject_feat: np.ndarray, eps: float = 1e-6) -> float:
    """Realism score of ONE subject feature against the real manifold.

    Reference-exact port of `scripts/improved_precision_recall.py:273-281`
    (module-level `realism`, exposed via `IPR.realism` at :88-94): the max
    over real samples of radius_i / (||feat_i - subject|| + eps).  A score
    >= 1 means the subject lies inside at least one real-manifold ball.
    (The IPR paper additionally clips radii to the median before the ratio;
    the reference code does not — we match the reference.)
    """
    dists = np.linalg.norm(
        np.asarray(real_feats, np.float64) - np.asarray(subject_feat, np.float64),
        axis=1)
    return float((np.asarray(real_radii, np.float64) / (dists + eps)).max())


def compute_realism_scores(real_feats: np.ndarray, subject_feats: np.ndarray,
                           k: int = 3, eps: float = 1e-6) -> np.ndarray:
    """Vectorized realism for a batch of subjects: (M,) scores.

    Batched form of `realism` (one pairwise-distance matrix instead of M
    row sweeps); the real manifold radii use the same k-NN rule as
    precision/recall (improved_precision_recall.py:240-253).
    """
    radii = knn_radii(real_feats, k)
    d = pairwise_distances(subject_feats, real_feats)  # (M, N)
    return (radii[None, :] / (d + eps)).max(axis=1)


def compute_ipr_folders(
    real_dir: str, fake_dir: str,
    feature_fn: Optional[Callable] = None,
    k: int = 3, num_samples: int = 5000,
) -> PrecisionRecall:
    from .fid import PixelFeatures, load_image_folder

    feature_fn = feature_fn or PixelFeatures()
    return compute_precision_recall(
        feature_fn(load_image_folder(real_dir)),
        feature_fn(load_image_folder(fake_dir)),
        k=k, num_samples=num_samples,
    )
