"""Perspective / orbiting-camera rendering (eval/render.py) and PLY export —
the reference's qualitative-viz camera surface
(generate_diffusion.py:82-127,157-162)."""
import os

import numpy as np

from diffuscene_tpu.eval.render import (
    orbit_camera_positions, render_meshes_perspective, render_orbit_frames,
)
from diffuscene_tpu.eval.retrieval import SceneMesh, write_ply


def _cuboid_mesh(center, half, label="box", kd=None):
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
    return SceneMesh(vertices=verts, faces=np.asarray(faces, np.int64),
                     label=label, kd=kd)


def test_perspective_projects_object_to_center():
    m = _cuboid_mesh((0, 0, 0), (0.5, 0.5, 0.5), kd=np.array([1.0, 0.0, 0.0]))
    img = render_meshes_perspective(
        [m], camera_position=(0, 0, -5), camera_target=(0, 0, 0),
        window_size=(64, 64))
    assert img.shape == (64, 64, 3)
    # red-ish object at the image center, white background at the corner
    c = img[32, 32]
    assert c[0] > 100 and c[0] > c[1] + 50 and c[0] > c[2] + 50, c
    assert (img[0, 0] == 255).all()


def test_perspective_zbuffer_occlusion():
    near = _cuboid_mesh((0, 0, -1.5), (0.5, 0.5, 0.2),
                        kd=np.array([0.0, 1.0, 0.0]))
    far = _cuboid_mesh((0, 0, 1.5), (0.5, 0.5, 0.2),
                       kd=np.array([0.0, 0.0, 1.0]))
    # camera on -z: `near` sits between the camera and `far`
    img = render_meshes_perspective(
        [far, near], camera_position=(0, 0, -6), camera_target=(0, 0, 0),
        window_size=(64, 64))
    c = img[32, 32]
    assert c[1] > c[2] + 50, c  # the green (near) box wins the z-buffer


def test_perspective_nonsquare_window():
    m = _cuboid_mesh((0, 0, 0), (0.5, 0.5, 0.5))
    img = render_meshes_perspective(
        [m], camera_position=(2, 2, -4), window_size=(96, 48))
    assert img.shape == (48, 96, 3)  # (H, W, 3) from (W, H) window_size


def test_orbit_positions_circle_the_target():
    pos = orbit_camera_positions((0, 2, -5), (0, 0, 0), 8)
    assert pos.shape == (8, 3)
    np.testing.assert_allclose(pos[0], (0, 2, -5), atol=1e-12)
    r = np.linalg.norm(pos - np.array([0.0, 0.0, 0.0]), axis=1)
    np.testing.assert_allclose(r, r[0], rtol=1e-9)  # constant radius
    np.testing.assert_allclose(pos[:, 1], 2.0, atol=1e-9)  # height preserved
    assert not np.allclose(pos[1], pos[0])


def test_render_orbit_frames_writes_files(tmp_path):
    m = _cuboid_mesh((0, 0, 0), (0.5, 0.5, 0.5))
    paths = render_orbit_frames([m], str(tmp_path / "frames"),
                                window_size=(32, 32), n_frames=4)
    assert len(paths) == 4
    assert all(os.path.isfile(p) for p in paths)


def test_write_ply_roundtrip(tmp_path):
    m = _cuboid_mesh((0, 0, 0), (1, 2, 3))
    p = str(tmp_path / "scene.ply")
    write_ply(m, p)
    lines = open(p).read().splitlines()
    assert lines[0] == "ply"
    nv = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    nf = int([l for l in lines if l.startswith("element face")][0].split()[-1])
    assert (nv, nf) == (8, 12)
    body = lines[lines.index("end_header") + 1:]
    verts = np.array([[float(x) for x in l.split()] for l in body[:nv]])
    np.testing.assert_allclose(verts, m.vertices, atol=1e-6)
    assert all(l.startswith("3 ") for l in body[nv:nv + nf])
