"""Golden parity of the eval math + mesh-retrieval selection vs the LIVE
reference code (closes VERDICT r4 Next #3 — the last comparable logic
surface that had only re-derived-oracle tests).

Loads, standalone from the read-only checkout with import-only stubs
(simple_3dviz / pyrr / trimesh / open3d / pyvista are absent here):

- `scripts/utils.py` — `axis_aligned_bbox_overlaps_3d` ('iou' mode ious +
  the overlap-ratio second output), `computer_intersection` (both the
  box-only and the stubbed `judge_mesh_intersec` counting branch),
  `judge_if_symmetry` / `computer_symmetry` (model_jids and
  verts/faces-identity branches)
- `scene_synthesis/datasets/threed_future_dataset.py` —
  `get_closest_furniture_to_box` / `_2dbox` / `_objfeats` /
  `_objfeats_and_size` selection over tie and boundary fixtures

Every stub is import-only or (for the pyvista mesh-intersection judge)
a PLANTED oracle fed identically to both sides, so the comparison
exercises the reference's selection/counting logic, not the stubs.
"""
import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_SCRIPTS = "/root/reference/scripts/utils.py"
REF_TFD = "/root/reference/scene_synthesis/datasets/threed_future_dataset.py"

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(REF_SCRIPTS) and os.path.isfile(REF_TFD)),
    reason="reference checkout not available",
)


def _stub_module(name):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


# planted pyvista intersection results, keyed by (id(mesh_a), id(mesh_b));
# set per-test before calling the reference's judge_mesh_intersec branch
_PLANTED_PV = {}


def _install_stubs():
    if "pyvista" in sys.modules and hasattr(sys.modules["pyvista"], "wrap"):
        return

    class _PVWrapped:
        def __init__(self, tm):
            self._tm = tm

        def intersection(self, other):
            hit = _PLANTED_PV.get((id(self._tm), id(other._tm)), False)
            n = 7 if hit else 0
            inter = types.SimpleNamespace(n_verts=n, n_faces=n)
            return inter, None, None

    pv = _stub_module("pyvista")
    pv.wrap = lambda tm: _PVWrapped(tm)
    sys.modules["pyvista"] = pv

    # `from turtle import color` (a stray reference import): importing the
    # real turtle pulls tkinter, which other golden tests stub partially —
    # stub turtle outright so import order between test files cannot matter
    if "turtle" not in sys.modules:
        turtle = _stub_module("turtle")
        turtle.color = lambda *a, **k: None
        sys.modules["turtle"] = turtle

    pyrr = _stub_module("pyrr")
    pyrr.Matrix44 = type("Matrix44", (), {})
    sys.modules.setdefault("trimesh", _stub_module("trimesh"))
    sys.modules.setdefault("open3d", _stub_module("open3d"))
    sys.modules["pyrr"] = pyrr

    s3 = sys.modules.get("simple_3dviz") or _stub_module("simple_3dviz")
    for name in ("Lines", "Mesh", "Spherecloud", "Scene"):
        if not hasattr(s3, name):
            setattr(s3, name, type(name, (), {}))
    sys.modules["simple_3dviz"] = s3
    s3_tm = sys.modules.get("simple_3dviz.renderables.textured_mesh") or _stub_module(
        "simple_3dviz.renderables.textured_mesh")
    for name in ("Material", "TexturedMesh"):
        if not hasattr(s3_tm, name):
            setattr(s3_tm, name, type(name, (), {}))
    sys.modules.setdefault("simple_3dviz.renderables", _stub_module("simple_3dviz.renderables"))
    sys.modules["simple_3dviz.renderables.textured_mesh"] = s3_tm
    s3_utils = _stub_module("simple_3dviz.utils")
    s3_utils.save_frame = lambda *a, **k: None
    s3_utils.render = lambda *a, **k: None
    sys.modules["simple_3dviz.utils"] = s3_utils
    s3_b = sys.modules.get("simple_3dviz.behaviours") or _stub_module("simple_3dviz.behaviours")
    sys.modules["simple_3dviz.behaviours"] = s3_b
    s3_misc = sys.modules.get("simple_3dviz.behaviours.misc") or _stub_module(
        "simple_3dviz.behaviours.misc")
    if not hasattr(s3_misc, "LightToCamera"):
        s3_misc.LightToCamera = type("LightToCamera", (), {})
    sys.modules["simple_3dviz.behaviours.misc"] = s3_misc
    s3_io = _stub_module("simple_3dviz.behaviours.io")
    s3_io.SaveFrames = type("SaveFrames", (), {})
    sys.modules["simple_3dviz.behaviours.io"] = s3_io

    # scene_synthesis.utils is imported for two mesh-assembly helpers the
    # functions under test never touch; stub it so the real package (which
    # needs trimesh/seaborn at module scope) stays unimported
    ss = _stub_module("scene_synthesis")
    ss_utils = _stub_module("scene_synthesis.utils")
    ss_utils.get_textured_objects = lambda *a, **k: None
    ss_utils.get_textured_objects_based_on_objfeats = lambda *a, **k: None
    sys.modules.setdefault("scene_synthesis", ss)
    sys.modules["scene_synthesis.utils"] = ss_utils


@pytest.fixture(scope="module")
def ref_utils():
    pytest.importorskip("torch")
    _install_stubs()
    name = "ref_scripts_utils"
    if name not in sys.modules:
        spec = importlib.util.spec_from_file_location(name, REF_SCRIPTS)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_tfd():
    pytest.importorskip("torch")
    _install_stubs()
    if "reftfd" not in sys.modules:
        pkg = types.ModuleType("reftfd")
        pkg.__path__ = [os.path.dirname(REF_TFD)]
        sys.modules["reftfd"] = pkg
        # threed_future_dataset's only relative import; the parser it pulls
        # is never called by the selection methods under test
        u = _stub_module("reftfd.utils")
        u.parse_threed_future_models = lambda *a, **k: []
        sys.modules["reftfd.utils"] = u
        spec = importlib.util.spec_from_file_location(
            "reftfd.threed_future_dataset", REF_TFD)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "reftfd"
        sys.modules["reftfd.threed_future_dataset"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["reftfd.threed_future_dataset"]


# ---------------------------------------------------------------------------
# fixtures: box sets covering ties, touching faces, containment, degenerate
# ---------------------------------------------------------------------------

def _random_boxes(rng, b, n):
    lo = rng.uniform(-4, 4, (b, n, 3))
    ext = rng.uniform(0.01, 2.5, (b, n, 3))
    return np.concatenate([lo, lo + ext], axis=-1).astype(np.float32)


def _crafted_boxes():
    """Exact-binary-coordinate scenes: touching faces (zero-volume overlap),
    identical boxes, full containment, a zero-extent box."""
    s1 = [
        [0, 0, 0, 1, 1, 1],
        [1, 0, 0, 2, 1, 1],        # touches s1[0] on a face: overlap 0
        [0.25, 0.25, 0.25, 0.75, 0.75, 0.75],  # inside s1[0]
        [0, 0, 0, 1, 1, 1],        # identical to s1[0]
    ]
    s2 = [
        [-2, -2, -2, -1, -1, -1],
        [-1.5, -1.5, -1.5, -0.5, -0.5, -0.5],
        [3, 3, 3, 3, 4, 4],        # zero extent in x
        [-4, 0, 0, 4, 0.5, 0.5],
    ]
    return np.asarray([s1, s2], np.float32)


def test_bbox_overlaps_iou_golden(ref_utils):
    import torch

    from diffuscene_tpu.eval.metrics import bbox_iou_and_overlap_ratio

    rng = np.random.default_rng(0)
    for boxes in (_crafted_boxes(), _random_boxes(rng, 3, 7), _random_boxes(rng, 2, 12)):
        ious_ref, ratio_ref = ref_utils.axis_aligned_bbox_overlaps_3d(
            torch.from_numpy(boxes), torch.from_numpy(boxes), mode="iou")
        ious, ratio = bbox_iou_and_overlap_ratio(boxes)
        np.testing.assert_allclose(ious, ious_ref.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ratio, ratio_ref.numpy(), rtol=1e-5, atol=1e-6)


class _FakeTrimesh:
    """Only what computer_intersection/computer_symmetry touch."""

    def __init__(self, bounds, n_verts=8, n_faces=12):
        self.bounding_box = types.SimpleNamespace(bounds=np.asarray(bounds, np.float32))
        self.vertices = np.zeros((n_verts, 3))
        self.faces = np.zeros((n_faces, 3), np.int64)


def _fake_scene(bboxes, counts=None):
    counts = counts or [(8, 12)] * len(bboxes)
    return [_FakeTrimesh(np.asarray(b, np.float32).reshape(2, 3), nv, nf)
            for b, (nv, nf) in zip(bboxes, counts)]


def test_computer_intersection_golden(ref_utils):
    from diffuscene_tpu.eval.metrics import compute_intersection

    rng = np.random.default_rng(1)
    scenes = [
        _crafted_boxes()[0],
        _crafted_boxes()[1],
        _random_boxes(rng, 1, 9)[0],
        np.asarray([[0, 0, 0, 1, 1, 1]], np.float32),          # single object
        np.asarray([[0, 0, 0, 1, 1, 1], [5, 5, 5, 6, 6, 6]], np.float32),  # disjoint
    ]
    for boxes in scenes:
        tms = _fake_scene(boxes)
        got_ref = ref_utils.computer_intersection(tms)
        got = compute_intersection(np.asarray(boxes))
        assert got[0] == got_ref[0] and got[1] == got_ref[1]
        np.testing.assert_allclose(got[2:], got_ref[2:], rtol=1e-5, atol=1e-7)


def test_computer_intersection_judge_branch_golden(ref_utils):
    """The judge_mesh_intersec branch with a PLANTED mesh-intersection
    oracle fed identically to both sides (the pyvista backend itself is
    environment-blocked; ours is tested exactly in test_mesh_intersect)."""
    from diffuscene_tpu.eval.metrics import compute_intersection

    boxes = _crafted_boxes()[0]
    tms = _fake_scene(boxes)
    # boxes 0/2, 0/3, 2/3 overlap positively; plant: 0/2 really intersects,
    # 0/3 does not (nested-but-counted-separate), 2/3 does
    planted = {(0, 2): True, (0, 3): False, (2, 3): True}
    _PLANTED_PV.clear()
    for (i, j), hit in planted.items():
        _PLANTED_PV[(id(tms[i]), id(tms[j]))] = hit
    got_ref = ref_utils.computer_intersection(tms, judge_mesh_intersec=True)
    _PLANTED_PV.clear()

    got = compute_intersection(
        np.asarray(boxes), pair_intersects=lambda i, j: planted.get((i, j), False))
    assert got[0] == got_ref[0] and got[1] == got_ref[1]
    np.testing.assert_allclose(got[2:], got_ref[2:], rtol=1e-5, atol=1e-7)


def test_judge_if_symmetry_golden(ref_utils):
    from diffuscene_tpu.eval.metrics import judge_if_symmetry

    base = np.asarray([0, 0, 0, 1, 1, 1], np.float64)

    def box(cx, cz, sx=0.5, sy=0.5, sz=0.5, cy=0.5):
        c = np.asarray([cx, cy, cz])
        s = np.asarray([sx, sy, sz])
        return np.concatenate([c - s, c + s])

    cases = [
        (base, box(0.5, 0.5)),                     # identical
        (base, box(0.5, 3.0)),                     # x centers match
        (base, box(3.0, 0.5)),                     # z centers match
        (base, box(3.0, 3.0)),                     # neither matches
        (base, box(0.5, 0.5, sx=0.6)),             # size diff exactly 0.1 (strict <)
        (base, box(0.5, 0.5, sx=0.59)),            # size diff just under
        (base, box(0.5 + 0.1, 3.0)),               # pos diff exactly 0.1 (strict <)
        (base, box(0.5 + 0.0999, 3.0)),            # pos diff just under
        (base, box(0.5, 0.5, sx=0.3, sy=0.7)),     # mixed size mismatch
    ]
    for b1, b2 in cases:
        assert judge_if_symmetry(b1, b2) == ref_utils.judge_if_symmetry(b1, b2), (b1, b2)


def test_computer_symmetry_golden(ref_utils):
    from diffuscene_tpu.eval.metrics import compute_symmetry

    # two nightstand-like twins (classes equal, same mesh identity, mirrored
    # about x), one same-class different-mesh pair, one different class
    boxes = np.asarray([
        [-2.0, 0, -1.1, -1.6, 0.5, -0.7],
        [1.6, 0, -1.1, 2.0, 0.5, -0.7],     # twin of 0 (same z center)
        [-0.5, 0, 0.0, 0.5, 0.9, 1.0],
        [-0.45, 0, 2.0, 0.55, 0.9, 3.0],    # same class as 2, same x center
        [3.0, 0, 3.0, 4.0, 2.0, 4.0],
    ], np.float64)
    classes = np.eye(4, dtype=np.float32)[[0, 0, 1, 1, 2]]
    counts = [(10, 16), (10, 16), (20, 30), (21, 30), (40, 60)]
    jids = ["a", "a", "b", "c", "d"]

    for use_jids in (False, True):
        tms = _fake_scene(boxes, counts)
        got_ref = ref_utils.computer_symmetry(
            tms, classes, model_jids=jids if use_jids else None)
        got = compute_symmetry(
            boxes, classes,
            model_jids=jids if use_jids else None,
            identity=None if use_jids else counts)
        assert got == got_ref

    # single-object early return
    assert compute_symmetry(boxes[:1], classes[:1]) == ref_utils.computer_symmetry(
        _fake_scene(boxes[:1]), classes[:1])


# ---------------------------------------------------------------------------
# retrieval selection
# ---------------------------------------------------------------------------

class _FakeFurniture:
    def __init__(self, label, size, lat32, lat64, uid):
        self.label = label
        self.size = np.asarray(size, np.float32)
        self._lat32 = np.asarray(lat32, np.float32)
        self._lat64 = np.asarray(lat64, np.float32)
        self.uid = uid

    def raw_model_norm_pc_lat32(self):
        return self._lat32

    def raw_model_norm_pc_lat(self):
        return self._lat64


def _catalog(rng):
    objs = []
    for i in range(30):
        label = ["chair", "table", "bed"][i % 3]
        objs.append(_FakeFurniture(
            label, rng.uniform(0.1, 2.0, 3).astype(np.float32),
            rng.normal(0, 1, 32), rng.normal(0, 1, 64), i))
    # exact-tie pairs (identical sizes/latents; insertion order decides):
    objs.append(_FakeFurniture("chair", [0.5, 0.5, 0.5], np.zeros(32), np.zeros(64), 100))
    objs.append(_FakeFurniture("chair", [0.5, 0.5, 0.5], np.zeros(32), np.zeros(64), 101))
    # lexsort tie: same size mse, different feat mse (and vice versa)
    objs.append(_FakeFurniture("table", [1.0, 1.0, 1.0], np.full(32, 0.2), np.full(64, 0.2), 102))
    objs.append(_FakeFurniture("table", [1.0, 1.0, 1.0], np.full(32, 0.1), np.full(64, 0.1), 103))
    return objs


def test_retrieval_selection_golden(ref_tfd):
    from diffuscene_tpu.data.threed_future import ThreedFutureDataset

    rng = np.random.default_rng(5)
    objs = _catalog(rng)
    ref_ds = ref_tfd.ThreedFutureDataset(list(objs))
    our_ds = ThreedFutureDataset(list(objs))

    queries = [rng.uniform(0.1, 2.0, 3).astype(np.float32) for _ in range(12)]
    queries += [np.asarray([0.5, 0.5, 0.5], np.float32),   # hits the tie pair
                np.asarray([1.0, 1.0, 1.0], np.float32)]
    for label in ("chair", "table", "bed"):
        for q in queries:
            a = ref_ds.get_closest_furniture_to_box(label, q)
            b = our_ds.get_closest_furniture_to_box(label, q)
            assert a.uid == b.uid, (label, q, a.uid, b.uid)
            a = ref_ds.get_closest_furniture_to_2dbox(label, q[[0, 2]])
            b = our_ds.get_closest_furniture_to_2dbox(label, q[[0, 2]])
            assert a.uid == b.uid, (label, q, a.uid, b.uid)

    feat_queries = [rng.normal(0, 1, 32).astype(np.float32) for _ in range(6)]
    feat_queries += [np.zeros(32, np.float32), np.full(32, 0.15, np.float32)]
    for label in ("chair", "table"):
        for qf in feat_queries:
            a = ref_ds.get_closest_furniture_to_objfeats(label, qf)
            b = our_ds.get_closest_furniture_to_objfeats(label, qf)
            assert a.uid == b.uid
            qf64 = np.concatenate([qf, qf]).astype(np.float32)
            a = ref_ds.get_closest_furniture_to_objfeats(label, qf64)
            b = our_ds.get_closest_furniture_to_objfeats(label, qf64)
            assert a.uid == b.uid
            for qs in (np.asarray([1.0, 1.0, 1.0], np.float32),
                       np.asarray([0.5, 0.5, 0.5], np.float32)):
                a = ref_ds.get_closest_furniture_to_objfeats_and_size(label, qf, qs)
                b = our_ds.get_closest_furniture_to_objfeats_and_size(label, qf, qs)
                assert a.uid == b.uid, (label, qs, a.uid, b.uid)
