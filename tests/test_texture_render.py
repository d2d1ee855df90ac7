"""Texture-sampled mesh rendering (VERDICT r2 missing #4).

Covers the UV+MTL-aware OBJ loader (data/raw.load_obj_mesh), barycentric
texture sampling in eval/render.render_meshes_topdown, floor-plan UV tiling
(eval/retrieval.floor_plan_from_scene), and the retrieval integration —
the native equivalents of the reference's TexturedMesh pipeline
(scene_synthesis/utils.py:10-77, scripts/utils.py:65-181,220-239).
"""
import os

import numpy as np
import pytest

from diffuscene_tpu.data.raw import load_obj_mesh
from diffuscene_tpu.eval.render import render_meshes_topdown
from diffuscene_tpu.eval.retrieval import SceneMesh, floor_plan_from_scene

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_texture(path, arr):
    Image.fromarray(np.asarray(arr, np.uint8)).save(path)
    return str(path)


# 2x2 texture: rows are texture-image rows (row 0 = top = vt v=1)
QUAD_TEX = np.array([[[255, 0, 0], [0, 255, 0]],
                     [[0, 0, 255], [255, 255, 0]]], np.uint8)


def _textured_quad(tex_path):
    """Horizontal quad y=1 over x,z in [-1,1], u=(x+1)/2, v=1-(z+1)/2.

    With the bottom-left vt origin, texture row then tracks +z and texture
    column tracks +x: quadrants are R(x<0,z<0) G(x>0,z<0) B(x<0,z>0)
    Y(x>0,z>0).
    """
    verts = np.array([[-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]],
                     np.float64)
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return SceneMesh(vertices=verts, faces=faces, label="quad",
                     texture_path=tex_path, face_uvs=uvs[faces])


def test_textured_quad_samples_texture(tmp_path):
    tex = _write_texture(tmp_path / "t.png", QUAD_TEX)
    mesh = _textured_quad(tex)
    S, E = 64, 2.0
    img = render_meshes_topdown([mesh], image_size=S, room_extent=E)
    scale = S / (2 * E)

    def px(x, z):
        return int((z + E) * scale), int((x + E) * scale)

    # horizontal face -> shade 1.0 -> exact texel colors
    np.testing.assert_array_equal(img[px(-0.5, -0.5)], [255, 0, 0])
    np.testing.assert_array_equal(img[px(0.5, -0.5)], [0, 255, 0])
    np.testing.assert_array_equal(img[px(-0.5, 0.5)], [0, 0, 255])
    np.testing.assert_array_equal(img[px(0.5, 0.5)], [255, 255, 0])
    # background untouched
    np.testing.assert_array_equal(img[0, 0], [255, 255, 255])

    # use_textures=False falls back to the flat override color even though
    # the mesh carries a texture (the CLI's --no_texture path)
    flat = render_meshes_topdown([mesh], image_size=S, room_extent=E,
                                 colors=np.array([[10, 20, 30]], np.uint8),
                                 use_textures=False)
    for q in [(-0.5, -0.5), (0.5, -0.5), (-0.5, 0.5), (0.5, 0.5)]:
        np.testing.assert_array_equal(flat[px(*q)], [10, 20, 30])

    # texture wins over a colors= override when sampling is on (the CLI
    # always passes class colors as the fallback palette)
    both = render_meshes_topdown([mesh], image_size=S, room_extent=E,
                                 colors=np.array([[10, 20, 30]], np.uint8))
    np.testing.assert_array_equal(both[px(-0.5, -0.5)], [255, 0, 0])


def test_uv_wrap_tiles_texture(tmp_path):
    """UVs outside [0,1) wrap (floor-plan tiling relies on this)."""
    tex = _write_texture(tmp_path / "t.png", QUAD_TEX)
    mesh = _textured_quad(tex)
    # scale UVs x3: u=3(x+1)/2 -> at x=-0.9 u=0.15 (R/B col), x=-0.4
    # u=0.9 -> frac 0.9 (G/Y col), x=0.1 u=1.65 -> frac .65 (G/Y col)
    mesh.face_uvs = mesh.face_uvs * 3.0
    S, E = 128, 2.0
    img = render_meshes_topdown([mesh], image_size=S, room_extent=E)
    scale = S / (2 * E)

    def px(x, z):
        return int((z + E) * scale), int((x + E) * scale)

    row = img[px(-0.9, 0.9)], img[px(-0.4, 0.9)], img[px(0.1, 0.9)]
    np.testing.assert_array_equal(row[0], [0, 0, 255])     # blue (z>0 col 0)
    np.testing.assert_array_equal(row[1], [255, 255, 0])   # yellow
    np.testing.assert_array_equal(row[2], [255, 255, 0])   # wrapped yellow


def test_kd_flat_color_fallback():
    """MTL Kd colors an untextured mesh when no colors override is given."""
    verts = np.array([[-1, 1, -1], [1, 1, -1], [-1, 1, 1]], np.float64)
    mesh = SceneMesh(vertices=verts, faces=np.array([[0, 1, 2]]),
                     label="x", kd=np.array([0.5, 0.0, 1.0], np.float32))
    img = render_meshes_topdown([mesh], image_size=32, room_extent=2.0)
    inside = (img != 255).any(-1)
    assert inside.any()
    np.testing.assert_array_equal(img[inside][0], [127, 0, 255])


def _write_obj(tmp_path, with_mtl=True, with_uvs=True, quad=True):
    lines = []
    if with_mtl:
        lines.append("mtllib model.mtl")
    lines += ["v -1 0 -1", "v 1 0 -1", "v 1 0 1", "v -1 0 1"]
    if with_uvs:
        lines += ["vt 0 0", "vt 1 0", "vt 1 1", "vt 0 1"]
    if with_mtl:
        lines.append("usemtl wood")
    if quad:
        lines.append("f 1/1 2/2 3/3 4/4" if with_uvs else "f 1 2 3 4")
    else:
        lines += (["f 1/1 2/2 3/3", "f 1/1 3/3 4/4"] if with_uvs
                  else ["f 1 2 3", "f 1 3 4"])
    p = tmp_path / "model.obj"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_load_obj_mesh_uv_and_mtl(tmp_path):
    tex = _write_texture(tmp_path / "wood.png", QUAD_TEX)
    (tmp_path / "model.mtl").write_text(
        "newmtl wood\nKd 0.8 0.7 0.6\nmap_Kd wood.png\n")
    m = load_obj_mesh(_write_obj(tmp_path))
    assert m["vertices"].shape == (4, 3)
    # quad fan-triangulated with aligned UV indices
    np.testing.assert_array_equal(m["faces"], [[0, 1, 2], [0, 2, 3]])
    assert m["face_uvs"].shape == (2, 3, 2)
    np.testing.assert_allclose(m["face_uvs"][0],
                               [[0, 0], [1, 0], [1, 1]])
    np.testing.assert_allclose(m["face_uvs"][1],
                               [[0, 0], [1, 1], [0, 1]])
    assert os.path.samefile(m["texture_path"], tex)
    np.testing.assert_allclose(m["kd"], [0.8, 0.7, 0.6])


def test_load_obj_mesh_fallbacks(tmp_path):
    # no MTL, no texture.png -> geometry only
    m = load_obj_mesh(_write_obj(tmp_path, with_mtl=False))
    assert m["texture_path"] is None and m["kd"] is None
    assert m["face_uvs"].shape == (2, 3, 2)
    # no UVs at all -> face_uvs None
    m2 = load_obj_mesh(_write_obj(tmp_path, with_mtl=False, with_uvs=False))
    assert m2["face_uvs"] is None
    # texture.png sitting next to the OBJ (the 3D-FUTURE layout,
    # threed_front_scene.py:241-246) is picked up without any MTL
    _write_texture(tmp_path / "texture.png", QUAD_TEX)
    m3 = load_obj_mesh(_write_obj(tmp_path, with_mtl=False))
    assert m3["texture_path"].endswith("texture.png")


def test_floor_plan_uv_tiling(tmp_path):
    tex = _write_texture(tmp_path / "floor.png", QUAD_TEX)
    room = {
        "floor_plan_vertices": np.array(
            [[0, 0, 0], [4, 0, 0], [4, 0, 4], [0, 0, 4]], np.float64),
        "floor_plan_faces": np.array([[0, 1, 2], [0, 2, 3]], np.int64),
        "floor_plan_centroid": np.array([2.0, 0.0, 2.0]),
    }
    floor = floor_plan_from_scene(room, [tex],
                                  rng=np.random.default_rng(0),
                                  texture_scale=2.0)
    assert floor.texture_path == tex
    # vertices centered at the centroid; UVs are world x,z / texture_scale
    np.testing.assert_allclose(floor.vertices.mean(0), [0, 0, 0], atol=1e-9)
    expect_uv = (room["floor_plan_vertices"] -
                 room["floor_plan_centroid"])[:, [0, 2]] / 2.0
    np.testing.assert_allclose(
        floor.face_uvs, expect_uv[room["floor_plan_faces"]])
    # renders without error and shows texture (not the label palette)
    img = render_meshes_topdown([floor], image_size=64, room_extent=3.0)
    assert (img != 255).any()
    # no textures given -> no UVs, no crash
    bare = floor_plan_from_scene(room)
    assert bare.texture_path is None and bare.face_uvs is None


class _FileObj:
    """Catalog object backed by a real OBJ on disk (retrieval fast path)."""

    def __init__(self, path, label="chair"):
        self.raw_model_path = path
        self.label = label
        self.size = np.array([1.0, 0.5, 1.0], np.float32)
        self.model_jid = "jid0"
        self.scale = 1.0


def test_retrieval_carries_texture_through(tmp_path):
    from diffuscene_tpu.data.threed_future import ThreedFutureDataset
    from diffuscene_tpu.eval.retrieval import get_textured_objects

    _write_texture(tmp_path / "wood.png", QUAD_TEX)
    (tmp_path / "model.mtl").write_text("newmtl wood\nmap_Kd wood.png\n")
    ds = ThreedFutureDataset([_FileObj(_write_obj(tmp_path))])
    boxes = {
        "translations": np.zeros((1, 3), np.float32),
        "sizes": np.array([[1, 0.5, 1]], np.float32),
        "angles": np.zeros((1, 1), np.float32),
        "class_labels": np.ones((1, 1), np.float32),
    }
    (mesh,) = get_textured_objects(boxes, ds, ["chair"])
    assert mesh.texture_path.endswith("wood.png")
    assert mesh.face_uvs is not None and mesh.face_uvs.shape[1:] == (3, 2)
    img = render_meshes_topdown([mesh], image_size=64, room_extent=2.0,
                                colors=np.array([[9, 9, 9]], np.uint8))
    inside = (img != 255).any(-1)
    # textured pixels, not the flat override
    assert inside.any() and not (img[inside] == [9, 9, 9]).all(-1).any()

def test_partial_uv_mesh_keeps_textured_faces(tmp_path):
    """A face without vt indices must NOT untexture the whole mesh: textured
    faces sample texels, the UV-less face falls back to flat color."""
    tex = _write_texture(tmp_path / "wood.png", QUAD_TEX)
    (tmp_path / "model.mtl").write_text(
        "newmtl wood\nKd 0.5 0.0 1.0\nmap_Kd wood.png\n")
    # left triangle textured (all-yellow corner), right triangle has no vt
    (tmp_path / "model.obj").write_text("\n".join([
        "mtllib model.mtl",
        "v -1 1 -1", "v 1 1 -1", "v 1 1 1", "v -1 1 1",
        "vt 0.9 0.1", "vt 0.9 0.1", "vt 0.9 0.1",
        "usemtl wood",
        "f 1/1 2/2 3/3",
        "f 1 3 4",
    ]) + "\n")
    m = load_obj_mesh(str(tmp_path / "model.obj"))
    assert m["face_uvs"].shape == (2, 3, 2)
    assert np.isfinite(m["face_uvs"][0]).all()
    assert np.isnan(m["face_uvs"][1]).all()
    assert m["texture_path"].endswith("wood.png")

    mesh = SceneMesh(vertices=m["vertices"], faces=m["faces"], label="x",
                     texture_path=m["texture_path"], face_uvs=m["face_uvs"],
                     kd=m["kd"])
    S, E = 64, 2.0
    img = render_meshes_topdown([mesh], image_size=S, room_extent=E)
    scale = S / (2 * E)

    def px(x, z):
        return int((z + E) * scale), int((x + E) * scale)

    # face 0 covers z < x (upper-left in v/u); its constant UV (0.9, 0.1)
    # hits the yellow texel.  face 1 covers z > x and is flat Kd purple.
    np.testing.assert_array_equal(img[px(0.5, -0.5)], [255, 255, 0])
    np.testing.assert_array_equal(img[px(-0.5, 0.5)], [127, 0, 255])


def test_multi_material_mesh_samples_per_group(tmp_path):
    """Each usemtl group samples its own map_Kd
    (reference TexturedMesh.from_file handles per-material textures)."""
    red = np.zeros((2, 2, 3), np.uint8); red[..., 0] = 200
    blue = np.zeros((2, 2, 3), np.uint8); blue[..., 2] = 200
    _write_texture(tmp_path / "red.png", red)
    _write_texture(tmp_path / "blue.png", blue)
    (tmp_path / "model.mtl").write_text(
        "newmtl a\nmap_Kd red.png\nnewmtl b\nmap_Kd blue.png\n")
    (tmp_path / "model.obj").write_text("\n".join([
        "mtllib model.mtl",
        "v -1 1 -1", "v 1 1 -1", "v 1 1 1", "v -1 1 1",
        "vt 0.5 0.5",
        "usemtl a",
        "f 1/1 2/1 3/1",
        "usemtl b",
        "f 1/1 3/1 4/1",
    ]) + "\n")
    m = load_obj_mesh(str(tmp_path / "model.obj"))
    np.testing.assert_array_equal(m["face_materials"], [0, 1])
    assert [os.path.basename(x["map_kd"]) for x in m["materials"]] == \
        ["red.png", "blue.png"]

    mesh = SceneMesh(vertices=m["vertices"], faces=m["faces"], label="x",
                     texture_path=m["texture_path"], face_uvs=m["face_uvs"],
                     kd=m["kd"], face_materials=m["face_materials"],
                     materials=m["materials"])
    S, E = 64, 2.0
    img = render_meshes_topdown([mesh], image_size=S, room_extent=E)
    scale = S / (2 * E)

    def px(x, z):
        return int((z + E) * scale), int((x + E) * scale)

    np.testing.assert_array_equal(img[px(0.5, -0.5)], [200, 0, 0])
    np.testing.assert_array_equal(img[px(-0.5, 0.5)], [0, 0, 200])


def test_texture_cache_persists_across_renders(tmp_path, monkeypatch):
    """Decoded textures are memoized across render calls (a generate run
    renders hundreds of scenes sharing catalog textures)."""
    import diffuscene_tpu.eval.render as render_mod

    tex = _write_texture(tmp_path / "t.png", QUAD_TEX)
    mesh = _textured_quad(tex)
    calls = []
    real_read = render_mod._read_image
    monkeypatch.setattr(render_mod, "_read_image",
                        lambda p: calls.append(p) or real_read(p))
    render_meshes_topdown([mesh], image_size=16, room_extent=2.0)
    render_meshes_topdown([mesh], image_size=16, room_extent=2.0)
    assert len(calls) == 1
    # a per-call cache dict scopes the memo to that call
    render_meshes_topdown([mesh], image_size=16, room_extent=2.0,
                          tex_cache={})
    assert len(calls) == 2


def test_write_obj_roundtrips_textured_multimaterial(tmp_path):
    """write_obj -> load_obj_mesh round-trips the diffuse channel: same
    per-material texture sampling, same flat fallback for UV-less faces
    (the reference exports per-object OBJ/MTL/texture triples through
    trimesh, scripts/utils.py:257-291)."""
    from diffuscene_tpu.eval.retrieval import write_obj

    red = np.zeros((2, 2, 3), np.uint8); red[..., 0] = 200
    blue = np.zeros((2, 2, 3), np.uint8); blue[..., 2] = 200
    _write_texture(tmp_path / "red.png", red)
    _write_texture(tmp_path / "blue.png", blue)
    (tmp_path / "model.mtl").write_text(
        "newmtl a\nKd 0.9 0.1 0.1\nmap_Kd red.png\n"
        "newmtl b\nKd 0.1 0.1 0.9\nmap_Kd blue.png\n")
    (tmp_path / "model.obj").write_text("\n".join([
        "mtllib model.mtl",
        "v -1 1 -1", "v 1 1 -1", "v 1 1 1", "v -1 1 1", "v 0 1 -2",
        "vt 0.5 0.5",
        "usemtl a",
        "f 1/1 2/1 3/1",
        "usemtl b",
        "f 1/1 3/1 4/1",
        "f 1 2 5",          # UV-less face: flat Kd fallback
    ]) + "\n")
    src = load_obj_mesh(str(tmp_path / "model.obj"))
    mesh = SceneMesh(vertices=src["vertices"], faces=src["faces"], label="x",
                     texture_path=src["texture_path"], face_uvs=src["face_uvs"],
                     kd=src["kd"], face_materials=src["face_materials"],
                     materials=src["materials"])

    out = tmp_path / "export"
    out.mkdir()
    written = write_obj(mesh, str(out / "scene.obj"))
    names = sorted(os.path.basename(p) for p in written)
    assert "scene.obj" in names and "scene.mtl" in names
    assert sum(n.endswith(".png") for n in names) == 2
    for p in written:
        assert os.path.isfile(p)

    back = load_obj_mesh(str(out / "scene.obj"))
    mesh2 = SceneMesh(vertices=back["vertices"], faces=back["faces"],
                      label="x", texture_path=back["texture_path"],
                      face_uvs=back["face_uvs"], kd=back["kd"],
                      face_materials=back["face_materials"],
                      materials=back["materials"])
    img1 = render_meshes_topdown([mesh], image_size=64, room_extent=3.0)
    img2 = render_meshes_topdown([mesh2], image_size=64, room_extent=3.0)
    np.testing.assert_array_equal(img1, img2)
    # the textured groups really sample their own maps after the round trip
    assert (img2 == [200, 0, 0]).all(-1).any()
    assert (img2 == [0, 0, 200]).all(-1).any()


def test_export_scene_writes_per_object_files(tmp_path):
    """export_scene writes one OBJ (+MTL/texture when textured) per mesh."""
    from diffuscene_tpu.eval.retrieval import export_scene

    tex = _write_texture(tmp_path / "t.png", QUAD_TEX)
    meshes = [_textured_quad(tex),
              SceneMesh(vertices=np.array([[0., 0, 0], [1, 0, 0], [0, 0, 1]]),
                        faces=np.array([[0, 1, 2]]), label="plain")]
    out = tmp_path / "objs"
    paths = export_scene(str(out), meshes)
    assert [os.path.basename(p) for p in paths] == \
        ["object_000.obj", "object_001.obj"]
    assert os.path.isfile(out / "object_000.mtl")
    assert os.path.isfile(out / "object_000_mat0.png")
    assert not os.path.isfile(out / "object_001.mtl")
    back = load_obj_mesh(str(out / "object_000.obj"))
    assert back["texture_path"].endswith("object_000_mat0.png")
    assert np.isfinite(back["face_uvs"]).all()


def test_shipped_demo_floor_textures():
    """The in-repo demo floor textures (procedural stand-ins for the
    reference's demo/floor_plan_texture_images JPGs) load and texture a
    floor plan end-to-end."""
    demo = os.path.join(os.path.dirname(__file__), os.pardir, "demo",
                        "floor_plan_texture_images")
    texs = sorted(os.path.join(demo, f) for f in os.listdir(demo)
                  if f.endswith(".jpg"))
    assert len(texs) == 7
    room = {
        "floor_plan_vertices": np.array(
            [[0, 0, 0], [4, 0, 0], [4, 0, 4], [0, 0, 4]], np.float64),
        "floor_plan_faces": np.array([[0, 1, 2], [0, 2, 3]], np.int64),
        "floor_plan_centroid": np.array([2.0, 0.0, 2.0]),
    }
    floor = floor_plan_from_scene(room, texs, rng=np.random.default_rng(3))
    assert floor.texture_path in texs
    img = render_meshes_topdown([floor], image_size=64, room_extent=3.0)
    inside = img[16:48, 16:48].reshape(-1, 3)
    assert (inside != 255).any()           # floor drawn
    assert len(np.unique(inside, axis=0)) > 4  # textured, not one flat color
