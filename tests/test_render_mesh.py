"""Mesh-rasterizing top-down renderer (eval/render.render_meshes_topdown).

Pixel-level checks on synthetic triangles (projection, z-buffer on world y,
flat shading), plus footprint consistency between a rasterized cuboid mesh
and the oriented-box renderer — the two render paths must agree where they
describe the same geometry (reference mesh renders:
scripts/generate_diffusion.py:251-264, scripts/utils.py:220-239).
"""
import numpy as np

from diffuscene_tpu.eval.render import render_meshes_topdown, render_topdown
from diffuscene_tpu.eval.retrieval import SceneMesh


def _tri(verts, label="t"):
    return SceneMesh(vertices=np.asarray(verts, np.float64),
                     faces=np.array([[0, 1, 2]]), label=label)


def test_two_triangle_zbuffer_and_shading():
    S, E = 64, 2.0
    # low horizontal triangle (y=0.5) covering the left half-ish
    low = _tri([[-1.5, 0.5, -1.5], [1.5, 0.5, -1.5], [-1.5, 0.5, 1.5]], "low")
    # high horizontal triangle (y=1.5) overlapping the center
    high = _tri([[-0.5, 1.5, -0.5], [0.5, 1.5, -0.5], [-0.5, 1.5, 0.5]], "high")
    red = np.array([[200, 0, 0], [0, 0, 200]], np.uint8)

    img = render_meshes_topdown([low, high], image_size=S, room_extent=E,
                                colors=red)
    # horizontal faces: |normal_y| = 1 -> shade = 1.0 -> exact base colors
    # a point clearly inside only the low triangle: world (-1.2, z=-1.2)
    scale = S / (2 * E)
    def px(x, z):
        return int(round((z + E) * scale - 0.5)), int(round((x + E) * scale - 0.5))
    r, c = px(-1.2, -1.2)
    np.testing.assert_array_equal(img[r, c], [200, 0, 0])
    # a point inside both: the high triangle must win the z-buffer
    r, c = px(-0.3, -0.3)
    np.testing.assert_array_equal(img[r, c], [0, 0, 200])
    # background untouched
    np.testing.assert_array_equal(img[S - 1, S - 1], [255, 255, 255])
    # order independence: painting [high, low] gives the identical image
    img2 = render_meshes_topdown([high, low], image_size=S, room_extent=E,
                                 colors=red[::-1])
    np.testing.assert_array_equal(img, img2)


def test_vertical_face_is_shaded_darker():
    S, E = 32, 2.0
    flat = _tri([[-1, 1, -1], [1, 1, -1], [-1, 1, 1]])
    # same footprint but tilted (vertices at different heights)
    tilted = _tri([[-1, 0.0, -1], [1, 2.0, -1], [-1, 2.0, 1]])
    white = np.array([[200, 200, 200]], np.uint8)
    img_flat = render_meshes_topdown([flat], image_size=S, room_extent=E,
                                     colors=white)
    img_tilt = render_meshes_topdown([tilted], image_size=S, room_extent=E,
                                     colors=white)
    inside = (img_flat != 255).any(-1)
    assert inside.any()
    assert img_flat[inside].max() == 200  # |ny|=1 -> full base color
    assert img_tilt[inside & (img_tilt != 255).any(-1)].max() < 200


def _cuboid(translation, size, theta):
    """12-triangle axis box, rotated about y and translated (world units)."""
    sx, sy, sz = size
    corners = np.array([[x, y, z] for x in (-sx, sx)
                        for y in (-sy, sy) for z in (-sz, sz)], np.float64)
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
    verts = corners @ R.T + np.asarray(translation)
    # faces of the unit box (indices into the 8 corners above)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = []
    for a, b, cc, d in quads:
        faces += [[a, b, cc], [a, cc, d]]
    return SceneMesh(vertices=verts, faces=np.asarray(faces), label="box")


def test_cuboid_mesh_footprint_matches_box_renderer():
    S, E = 128, 3.1
    trans = np.array([[0.8, 0.5, -0.4]])
    size = np.array([[0.7, 0.5, 0.4]])
    theta = 0.6
    cls = np.array([[1.0]])

    box_img = render_topdown(trans, size, np.array([[theta]]), cls,
                             image_size=S, room_extent=E,
                             palette=np.array([[200, 0, 0]], np.uint8))
    mesh = _cuboid(trans[0], size[0], theta)
    mesh_img = render_meshes_topdown([mesh], image_size=S, room_extent=E,
                                     colors=np.array([[200, 0, 0]], np.uint8))
    box_in = (box_img[..., 0] == 200)
    # box renderer paints over a (230,230,230) floor; mesh over white
    mesh_in = (mesh_img != 255).any(-1)
    inter = (box_in & mesh_in).sum()
    union = (box_in | mesh_in).sum()
    assert union > 200  # the object is actually visible
    assert inter / union > 0.93, (inter, union)  # same footprint +- edge pixels


def test_mesh_render_smoke_from_retrieval_types():
    """merge-free multi-mesh render with default label palette."""
    meshes = [
        _cuboid([0, 0.3, 0], [0.5, 0.3, 0.5], 0.0),
        _tri([[-2, 0.01, -2], [2, 0.01, -2], [-2, 0.01, 2]], "floor"),
    ]
    img = render_meshes_topdown(meshes, image_size=64, room_extent=3.0)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert (img != 255).any()
