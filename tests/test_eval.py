"""Eval suite tests: metric golden values, FID/KID sanity, IPR behavior,
post-processing, and furniture retrieval."""
import numpy as np
import pytest

from diffuscene_tpu.diffusion import AttributeSpec
from diffuscene_tpu.eval import (
    bbox_iou_and_overlap_ratio,
    categorical_kl,
    compute_intersection,
    compute_precision_recall,
    compute_symmetry,
    fid_from_features,
    judge_if_symmetry,
    kid_from_features,
    scene_bboxes_from_params,
    split_network_samples,
)
from diffuscene_tpu.data.threed_future import ThreedFutureDataset


def test_categorical_kl():
    p = np.array([0.5, 0.5])
    assert abs(categorical_kl(p, p)) < 1e-5
    q = np.array([0.9, 0.1])
    assert categorical_kl(p, q) > 0


def test_bbox_overlap_ratio_golden():
    # two unit boxes, half-overlapping along x
    boxes = np.array([[[0, 0, 0, 1, 1, 1], [0.5, 0, 0, 1.5, 1, 1]]], np.float32)
    ious, ratio = bbox_iou_and_overlap_ratio(boxes)
    np.testing.assert_allclose(ious[0, 0, 1], 0.5 / 1.5, atol=1e-6)
    # overlap_sum = 0.5, area_sum = 2 - 0.5 = 1.5 -> ratio = 1/3
    np.testing.assert_allclose(ratio[0], 0.5 / 1.5, atol=1e-6)

    # disjoint boxes -> zero
    boxes = np.array([[[0, 0, 0, 1, 1, 1], [5, 5, 5, 6, 6, 6]]], np.float32)
    ious, ratio = bbox_iou_and_overlap_ratio(boxes)
    assert ious[0, 0, 1] == 0 and ratio[0] == 0


def test_compute_intersection():
    boxes = np.array([[0, 0, 0, 1, 1, 1], [0.5, 0, 0, 1.5, 1, 1], [5, 5, 5, 6, 6, 6]], np.float32)
    n, pairs, avg_iou, avg_insec, ratio = compute_intersection(boxes)
    assert n == 3 and pairs == 3
    np.testing.assert_allclose(avg_iou, (0.5 / 1.5) / 3, atol=1e-6)
    np.testing.assert_allclose(avg_insec, 1 / 3, atol=1e-6)
    # single object early-return
    assert compute_intersection(boxes[:1]) == (1, 1, 0.0, 0.0, 0.0)


def test_symmetry():
    b1 = np.array([0, 0, 0, 1, 1, 1], np.float32)
    b2 = np.array([2, 0, 0.05, 3, 1, 1.05], np.float32)  # same size, z-aligned
    assert judge_if_symmetry(b1, b2)
    cls = np.eye(3, dtype=np.float32)[[0, 0]]
    assert compute_symmetry(np.stack([b1, b2]), cls) == 1
    # different classes -> 0
    cls2 = np.eye(3, dtype=np.float32)[[0, 1]]
    assert compute_symmetry(np.stack([b1, b2]), cls2) == 0


def test_fid_kid_sanity():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (256, 16))
    b = rng.normal(0, 1, (256, 16))
    c = rng.normal(3, 1, (256, 16))
    fid_same = fid_from_features(a, b)
    fid_diff = fid_from_features(a, c)
    assert fid_same < fid_diff
    kid_same = kid_from_features(a, b, subset_size=128, n_subsets=10)
    kid_diff = kid_from_features(a, c, subset_size=128, n_subsets=10)
    assert abs(kid_same) < 0.1 < kid_diff


def test_ipr_identical_sets():
    rng = np.random.default_rng(1)
    feats = rng.normal(0, 1, (200, 8))
    pr = compute_precision_recall(feats, feats, k=3, num_samples=None)
    assert pr.precision == 1.0 and pr.recall == 1.0
    # far-apart sets -> 0
    pr0 = compute_precision_recall(feats, feats + 100.0, k=3, num_samples=None)
    assert pr0.precision == 0.0 and pr0.recall == 0.0


def test_realism_scores():
    """realism = max_i radius_i / (||real_i - subject|| + 1e-6)
    (improved_precision_recall.py:273-281), radii via the k-NN rule."""
    from diffuscene_tpu.eval.ipr import compute_realism_scores, knn_radii, realism

    rng = np.random.default_rng(2)
    real = rng.normal(0, 1, (64, 8))
    subjects = np.concatenate([real[:4] + 1e-4,            # near-duplicates
                               rng.normal(0, 1, (8, 8)),    # in-distribution
                               rng.normal(50, 1, (4, 8))])  # far outliers
    radii = knn_radii(real, k=3)
    scores = compute_realism_scores(real, subjects, k=3)
    assert scores.shape == (16,)
    # brute-force oracle per subject (the reference's exact formula)
    for j in range(len(subjects)):
        d = np.linalg.norm(real - subjects[j], axis=1)
        expect = (radii / (d + 1e-6)).max()
        # batched path uses the ||x||^2+||y||^2-2xy form -> ~1e-7 rel noise
        np.testing.assert_allclose(scores[j], expect, rtol=1e-6)
        np.testing.assert_allclose(realism(real, radii, subjects[j]), expect,
                                   rtol=1e-12)
    assert (scores[:4] > 1.0).all()      # near-duplicates are "realistic"
    assert (scores[-4:] < 0.1).all()     # far outliers are not


def test_split_network_samples():
    spec = AttributeSpec(class_dim=4, objfeat_dim=2)  # point_dim = 3+3+2+4+2
    B, N = 2, 5
    s = np.zeros((B, N, spec.point_dim), np.float32)
    # mark slots 0,1 non-empty (last class channel < 0), rest empty
    s[:, :, spec.bbox_dim + spec.class_dim - 1] = 1.0
    s[:, :2, spec.bbox_dim + spec.class_dim - 1] = -1.0
    s[0, 0, 0:3] = [1, 2, 3]
    out = split_network_samples(spec, s)
    assert len(out) == B
    assert out[0]["translations"].shape == (2, 3)
    np.testing.assert_array_equal(out[0]["translations"][0], [1, 2, 3])
    assert out[0]["class_labels"].shape == (2, 3)  # empty channel stripped
    assert out[0]["objfeats"].shape == (2, 2)
    # keep_empty keeps all slots
    assert split_network_samples(spec, s, keep_empty=True)[0]["translations"].shape == (5, 3)


class _Obj:
    def __init__(self, label, size, lat32):
        self.label = label
        self.size = np.asarray(size, np.float32)
        self._lat = np.asarray(lat32, np.float32)

    def raw_model_norm_pc_lat32(self):
        return self._lat


def test_furniture_retrieval():
    objs = [
        _Obj("chair", [1, 1, 1], [0.0] * 32),
        _Obj("chair", [2, 2, 2], [1.0] * 32),
        _Obj("table", [1, 1, 1], [0.0] * 32),
    ]
    ds = ThreedFutureDataset(objs)
    assert ds.get_closest_furniture_to_box("chair", np.array([1.9, 1.9, 1.9])) is objs[1]
    assert ds.get_closest_furniture_to_2dbox("chair", np.array([1.0, 1.0])) is objs[0]
    got = ds.get_closest_furniture_to_objfeats("chair", np.full(32, 0.9, np.float32))
    assert got is objs[1]
    # size dominates in the lexsort (secondary key = feats)
    got2 = ds.get_closest_furniture_to_objfeats_and_size(
        "chair", np.full(32, 0.9, np.float32), np.array([1, 1, 1]))
    assert got2 is objs[0]
