"""Exact mesh-intersection backend (eval/mesh_intersect.py): Möller tri-tri
cases, cuboid mesh pairs (overlapping / touching / disjoint / nested), and
the compute_intersection judge_mesh_intersec hook — the TPU repo's equivalent
of the reference's pyvista branch (scripts/utils.py:686-691)."""
import numpy as np

from diffuscene_tpu.eval.mesh_intersect import (
    make_pair_intersects, mesh_pair_intersects, tri_tri_intersect,
)
from diffuscene_tpu.eval.metrics import compute_intersection, scene_bboxes_from_params


def _cuboid(center, half):
    cx, cy, cz = center
    hx, hy, hz = half
    verts = np.array([[cx + sx * hx, cy + sy * hy, cz + sz * hz]
                      for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                     np.float64)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    return verts, np.asarray(faces, np.int64)


# ---------------------------------------------------------------- tri-tri
def _t(*pts):
    return np.asarray(pts, np.float64)[None]


def test_tri_tri_crossing():
    # vertical triangle piercing a horizontal one
    a = _t((0, 0, 0), (2, 0, 0), (0, 2, 0))
    b = _t((0.5, 0.5, -1), (0.5, 0.5, 1), (1.5, 0.5, 1))
    assert tri_tri_intersect(a, b)[0]
    assert tri_tri_intersect(b, a)[0]


def test_tri_tri_parallel_separated():
    a = _t((0, 0, 0), (1, 0, 0), (0, 1, 0))
    b = _t((0, 0, 1), (1, 0, 1), (0, 1, 1))
    assert not tri_tri_intersect(a, b)[0]


def test_tri_tri_same_plane_disjoint():
    a = _t((0, 0, 0), (1, 0, 0), (0, 1, 0))
    b = _t((3, 0, 0), (4, 0, 0), (3, 1, 0))
    assert not tri_tri_intersect(a, b)[0]


def test_tri_tri_coplanar_overlapping():
    a = _t((0, 0, 0), (2, 0, 0), (0, 2, 0))
    b = _t((0.5, 0.5, 0), (2.5, 0.5, 0), (0.5, 2.5, 0))
    assert tri_tri_intersect(a, b)[0]


def test_tri_tri_coplanar_contained():
    # b entirely inside a, same plane: no edge crossings, containment only
    a = _t((0, 0, 0), (4, 0, 0), (0, 4, 0))
    b = _t((0.5, 0.5, 0), (1.5, 0.5, 0), (0.5, 1.5, 0))
    assert tri_tri_intersect(a, b)[0]


def test_tri_tri_touching_at_point():
    # closed-triangle semantics: a single shared vertex counts
    a = _t((0, 0, 0), (1, 0, 0), (0, 1, 0))
    b = _t((0, 0, 0), (-1, 0, 1), (0, -1, 1))
    assert tri_tri_intersect(a, b)[0]


def test_tri_tri_crossing_plane_but_outside():
    # b's plane crosses a, but the triangles' intervals on the line miss
    a = _t((0, 0, 0), (1, 0, 0), (0, 1, 0))
    b = _t((5, 0, -1), (5, 0, 1), (6, 1, 0))
    assert not tri_tri_intersect(a, b)[0]


def test_tri_tri_batch():
    a = np.concatenate([
        _t((0, 0, 0), (2, 0, 0), (0, 2, 0)),
        _t((0, 0, 0), (1, 0, 0), (0, 1, 0)),
    ])
    b = np.concatenate([
        _t((0.5, 0.5, -1), (0.5, 0.5, 1), (1.5, 0.5, 1)),
        _t((0, 0, 1), (1, 0, 1), (0, 1, 1)),
    ])
    np.testing.assert_array_equal(tri_tri_intersect(a, b), [True, False])


# ---------------------------------------------------------------- meshes
def test_mesh_pair_overlapping():
    m1 = _cuboid((0, 0, 0), (1, 1, 1))
    m2 = _cuboid((1.5, 0, 0), (1, 1, 1))  # penetrates by 0.5
    assert mesh_pair_intersects(m1, m2)


def test_mesh_pair_disjoint():
    m1 = _cuboid((0, 0, 0), (1, 1, 1))
    m2 = _cuboid((5, 0, 0), (1, 1, 1))
    assert not mesh_pair_intersects(m1, m2)


def test_mesh_pair_touching_faces():
    # shared face at x=1, zero penetration: closed semantics -> intersecting
    m1 = _cuboid((0, 0, 0), (1, 1, 1))
    m2 = _cuboid((2, 0, 0), (1, 1, 1))
    assert mesh_pair_intersects(m1, m2)


def test_mesh_pair_nested_no_surface_crossing():
    # one mesh strictly inside the other: like pyvista's surface
    # intersection, no crossing is reported (scripts/utils.py:686-691)
    m1 = _cuboid((0, 0, 0), (2, 2, 2))
    m2 = _cuboid((0, 0, 0), (0.5, 0.5, 0.5))
    assert not mesh_pair_intersects(m1, m2)


def test_mesh_pair_accepts_scene_mesh():
    from diffuscene_tpu.eval.retrieval import SceneMesh

    v1, f1 = _cuboid((0, 0, 0), (1, 1, 1))
    v2, f2 = _cuboid((1.5, 0, 0), (1, 1, 1))
    a = SceneMesh(vertices=v1, faces=f1, label="a")
    b = SceneMesh(vertices=v2, faces=f2, label="b")
    assert mesh_pair_intersects(a, b)


# -------------------------------------------------- compute_intersection hook
def test_judge_mesh_intersec_overrides_box_iou():
    """Boxes whose AABBs overlap but whose meshes don't cross only count as
    intersecting in the box-only metric (scripts/utils.py judge_mesh_intersec
    semantics)."""
    # L-shaped arrangement: AABB of a thin diagonal-ish mesh overlaps the
    # other box while the actual cuboids stay apart
    meshes = [
        _cuboid((0, 0, 0), (1.0, 1.0, 1.0)),
        _cuboid((1.5, 0, 0), (1.0, 1.0, 1.0)),   # crosses mesh 0
        _cuboid((10, 0, 0), (1.0, 1.0, 1.0)),    # far away
    ]
    centers = np.array([[0, 0, 0], [1.5, 0, 0], [10, 0, 0]], np.float64)
    halves = np.ones((3, 3), np.float64)
    bb = scene_bboxes_from_params(centers, halves)

    n, pairs, avg_iou, avg_insec, ratio = compute_intersection(bb)
    n2, pairs2, avg_iou2, avg_insec2, _ = compute_intersection(
        bb, pair_intersects=make_pair_intersects(meshes))
    assert (n, pairs) == (n2, pairs2) == (3, 3)
    assert avg_insec == avg_insec2 > 0  # the real crossing survives

    # now shrink mesh 1 so the boxes still overlap but the surfaces don't
    meshes[1] = _cuboid((2.5, 0, 0), (0.25, 0.25, 0.25))
    _, _, avg_iou3, avg_insec3, _ = compute_intersection(
        bb, pair_intersects=make_pair_intersects(meshes))
    assert avg_insec3 == 0.0 and avg_iou3 == 0.0
    assert avg_insec > 0.0
