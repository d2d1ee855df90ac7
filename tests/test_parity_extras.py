"""Parity extras: calc_bpd_loop, PLY I/O, autoregressive encodings,
build_network dispatch, mesh retrieval + OBJ export."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from diffuscene_tpu.data.encoding import (
    Bounds, autoregressive_encode, autoregressive_wocm_encode, build_encoding,
)
from diffuscene_tpu.data.utils_io import export_pointcloud, load_pointcloud
from diffuscene_tpu.diffusion import calc_bpd_loop, make_schedule
from diffuscene_tpu.eval.retrieval import (
    SceneMesh, export_scene, get_textured_objects, merge_meshes, write_obj,
)
from diffuscene_tpu.models import build_network


def test_calc_bpd_loop_perfect_denoiser():
    """With the true-eps denoiser, VB terms should be ~0 bits/dim."""
    sched = make_schedule("linear", 1e-4, 0.02, 8, model_mean_type="eps")
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (2, 4, 6), minval=-0.5, maxval=0.5)

    # cheat denoiser: recover eps exactly from (x_t, t) given known x0
    from diffuscene_tpu.diffusion import predict_eps_from_xstart

    def denoise_fn(x_t, t):
        return predict_eps_from_xstart(sched, x_t, t, x0)

    total, vb, prior, mse = jax.jit(
        lambda k: calc_bpd_loop(sched, "eps", "fixedsmall", denoise_fn, x0, k,
                                clip_denoised=False)
    )(jax.random.PRNGKey(1))
    assert float(mse) < 1e-8
    assert float(vb) < 1e-4
    assert np.isfinite(float(total)) and float(prior) >= 0


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(0, 1, (100, 3)).astype(np.float32)
    for as_text in (True, False):
        p = str(tmp_path / f"pc_{as_text}.ply")
        export_pointcloud(pts, p, as_text=as_text)
        got = load_pointcloud(p)
        np.testing.assert_allclose(got, pts, atol=1e-5)


def _sample(n=4, C=6):
    cls = np.eye(C, dtype=np.float32)[np.arange(n) % (C - 2)]
    return {
        "translations": np.random.default_rng(0).normal(0, 1, (n, 3)).astype(np.float32),
        "sizes": np.abs(np.random.default_rng(1).normal(0.5, 0.1, (n, 3))).astype(np.float32),
        "angles": np.zeros((n, 1), np.float32),
        "class_labels": cls,
    }


def test_autoregressive_encodings():
    s = _sample()
    ar = autoregressive_encode(s)
    assert ar["class_labels_tr"].shape == (5, 6)
    np.testing.assert_array_equal(ar["class_labels_tr"][-1], np.eye(6)[-1])
    np.testing.assert_array_equal(ar["translations_tr"][-1], 0.0)
    assert ar["length"] == 4

    rng = np.random.default_rng(0)
    w = autoregressive_wocm_encode(_sample(), rng)
    n = w["length"]
    assert w["translations"].shape == (n, 3)
    assert w["translations_tr"].shape == (3,)
    assert w["class_labels_tr"].shape == (6,)


def test_build_encoding_autoregressive_dispatch():
    bounds = Bounds(
        translations=(np.zeros(3), np.ones(3)),
        sizes=(np.zeros(3), np.ones(3)),
        angles=(np.array(-np.pi), np.array(np.pi)),
    )
    enc = build_encoding("cached_autoregressivewocm", bounds, 12,
                         [f"c{i}" for i in range(4)] + ["start", "end"], {})
    out = enc(_sample())
    assert "class_labels_tr" in out


def test_build_network_dispatch():
    cfg = {"network": {"type": "diffusion_scene_layout_ddpm", "point_dim": 62,
                       "class_dim": 22, "angle_dim": 2, "objectness_dim": 0,
                       "objfeat_dim": 32, "sample_num_points": 12,
                       "room_mask_condition": False,
                       "net_kwargs": {"dim": 16, "dim_mults": [1], "channels": 62,
                                      "class_dim": 22, "angle_dim": 2,
                                      "objfeat_dim": 32, "instanclass_dim": 8}}}
    model, params = build_network(24, cfg)
    assert params is None and model.cfg.point_dim == 62
    ae, _ = build_network(24, {"network": {"type": "objautoencoder",
                                           "objfeat_dim": 32, "kl_weight": 1e-3}})
    assert ae.latent_dim == 32


class _Obj:
    def __init__(self, label, size):
        self.label = label
        self.size = np.asarray(size, np.float32)
        self.model_jid = f"jid_{label}"
        self.scale = 1.0

    def raw_model(self):
        v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], float)
        f = np.array([[0, 1, 2], [1, 3, 2]])
        return v, f


def test_retrieval_and_export(tmp_path):
    from diffuscene_tpu.data.threed_future import ThreedFutureDataset

    ds = ThreedFutureDataset([_Obj("chair", [1, 1, 1]), _Obj("table", [2, 1, 2])])
    boxes = {
        "translations": np.array([[0, 0, 0], [3, 0, 0]], np.float32),
        "sizes": np.array([[1, 1, 1], [2, 1, 2]], np.float32),
        "angles": np.array([[0.0], [np.pi / 2]], np.float32),
        "class_labels": np.eye(2, dtype=np.float32),
    }
    meshes = get_textured_objects(boxes, ds, ["chair", "table"])
    assert [m.label for m in meshes] == ["chair", "table"]
    # translated to the requested position
    np.testing.assert_allclose(meshes[1].vertices.mean(0), [3, 0, 0], atol=1e-6)
    merged = merge_meshes(meshes)
    # second mesh's faces are offset by its 8-vertex block (max index 8+3)
    assert merged.vertices.shape == (16, 3) and merged.faces.max() == 11
    paths = export_scene(str(tmp_path), meshes)
    assert all(os.path.isfile(p) for p in paths)
    # OBJ round-trips through our loader
    from diffuscene_tpu.data.raw import load_obj_vertices_faces

    v, f = load_obj_vertices_faces(paths[0])
    np.testing.assert_allclose(v, meshes[0].vertices, atol=1e-5)
