"""End-to-end shape-AE / objfeats pipeline chain (VERDICT r2 item 1).

Runs the reference's offline objfeat pipeline as one chain through the real
CLI entry points, on a synthetic 3D-FRONT/3D-FUTURE fixture:

  synthetic OBJs
    -> cli.pickle_threed_future_pointcloud   (scripts/pickle_threed_fucture_pointcloud.py:21-187)
    -> cli.pickle_threed_future_dataset      (scripts/pickle_threed_fucture_dataset.py:13-115)
    -> cli.train_objautoencoder  x2 (lat32 + lat "64")
                                             (scripts/train_objautoencoder.py:112-184)
    -> cli.generate_objautoencoder           (scripts/generate_objautoencoder.py:215-230)
    -> latents load through ThreedFutureModel.raw_model_norm_pc_lat[32]()
                                             (threed_front_scene.py:261-267)
    -> cli.preprocess_data --add_objfeats    (scripts/preprocess_data.py:191-294)
    -> cli.train_diffusion consumes the regenerated objfeats.

Dims are tiny and epochs=1 so the whole chain stays CPU-feasible; the same
driver runs full-size on real TPU (CLAUDE.md rehearsal notes).
"""
import json
import os

import numpy as np
import pytest

# jid -> raw 3D-FUTURE category (all keys of the bedroom furniture map)
MODELS = {
    "jid_bed": "king-size bed",
    "jid_nightstand": "nightstand",
    "jid_wardrobe": "wardrobe",
    "jid_desk": "desk",
    "jid_armchair": "armchair",
    "jid_shelf": "bookcase/jewelry armoire",
    "jid_dresser": "dressing table",
    "jid_coffee": "coffee table",
}
JIDS = list(MODELS)
N_ROOMS_TRAIN, N_ROOMS_TEST = 8, 8
N_POINTS = 256
BATCH = 8


def _write_obj(path, size):
    sx, sy, sz = size
    verts = [(x * sx, y * sy, z * sz)
             for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        # two faces of the cuboid; enough surface for area-weighted sampling
        f.write("f 1 2 4 3\n")
        f.write("f 5 6 8 7\n")


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    """Synthetic 3D-FRONT + 3D-FUTURE trees: 8 furniture models, 16 bedrooms."""
    root = tmp_path_factory.mktemp("ae_chain")
    front, future = root / "3D-FRONT", root / "3D-FUTURE-model"
    front.mkdir()
    future.mkdir()
    rng = np.random.default_rng(7)
    model_info = []
    for i, (jid, cat) in enumerate(MODELS.items()):
        (future / jid).mkdir()
        size = 0.4 + 0.15 * rng.random(3) + 0.05 * i
        _write_obj(str(future / jid / "raw_model.obj"), size)
        model_info.append({
            "model_id": jid, "super-category": "misc", "category": cat,
            "style": "modern", "theme": None, "material": "wood",
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
    rooms = []
    for r in range(N_ROOMS_TRAIN + N_ROOMS_TEST):
        # bed always present (the bedroom filter requires one); rotate through
        # the rest so every model appears in some valid scene
        extras = [JIDS[1 + (r + k) % (len(JIDS) - 1)] for k in range(3)]
        # y=0.5 keeps every bbox bottom above the floor (the bedroom filter
        # rejects rooms whose min-y dips below -0.005); varied y-rotations keep
        # the dataset's angle bounds non-degenerate (min < max)
        def yrot(theta):
            return (0.0, float(np.sin(theta / 2)), 0.0, float(np.cos(theta / 2)))

        # vary y too: a constant height makes the translation-y bound
        # degenerate (max == min -> NaN in min-max normalization)
        children = [child("u_jid_bed", (0, 0.5 + 0.02 * (r % 5), 0),
                          rot=yrot(0.3 * (r % 4)))]
        for k, jid in enumerate(extras):
            children.append(child(f"u_{jid}",
                                  (1.5 - k * 1.2, 0.5 + 0.03 * k, 1.0 - k * 0.8),
                                  rot=yrot(-0.5 + 0.4 * k)))
        children.append(child("mesh0", (0, 0, 0)))
        rooms.append({
            "instanceid": f"Bedroom-{1001 + r}", "type": "BedRoom",
            "children": children,
        })
    scene_json = {
        "furniture": [{"uid": f"u_{jid}", "jid": jid, "valid": True} for jid in JIDS],
        "mesh": [floor_mesh],
        "scene": {"room": rooms},
    }
    with open(front / "scene0.json", "w") as f:
        json.dump(scene_json, f)

    splits = root / "splits.csv"
    lines = [f"Bedroom-{1001 + r},train" for r in range(N_ROOMS_TRAIN)]
    lines += [f"Bedroom-{1001 + N_ROOMS_TRAIN + r},test" for r in range(N_ROOMS_TEST)]
    splits.write_text("\n".join(lines) + "\n")
    return {"root": str(root), "front": str(front), "future": str(future),
            "model_info": str(future / "model_info.json"), "splits": str(splits)}


def _ae_config(path, latent_dim):
    import yaml

    cfg = {
        "network": {"objfeat_dim": latent_dim, "kl_weight": 0.001},
        "training": {
            "epochs": 1, "batch_size": BATCH, "save_frequency": 100,
            "max_grad_norm": 10, "optimizer": "Adam", "schedule": "step",
            "lr": 1e-4, "lr_step": 400, "lr_decay": 0.1,
        },
        "logger": {"type": "stats"},
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def test_shape_ae_objfeats_chain(raw_root):
    root = raw_root["root"]

    # ---- 1. sample normalized pointclouds per model --------------------
    from diffuscene_tpu.cli.pickle_threed_future_pointcloud import main as pc_main

    pc_main([os.path.join(root, "pc_out"), raw_root["front"], raw_root["future"],
             raw_root["model_info"], "--n_points", str(N_POINTS)])
    for jid in JIDS:
        p = os.path.join(raw_root["future"], jid, "raw_model_norm_pc.npz")
        pts = np.load(p)["points"]
        assert pts.shape == (N_POINTS, 3)
        # normalized to the unit cube: longest side 1, bbox-centered
        ext = pts.max(0) - pts.min(0)
        assert ext.max() <= 1.0 + 1e-6
    assert os.path.isfile(os.path.join(root, "pc_out", "train.lst"))

    # ---- 2. pickle the deduped furniture catalog -----------------------
    from diffuscene_tpu.cli.pickle_threed_future_dataset import main as cat_main

    cat_main([root, raw_root["front"], raw_root["future"], raw_root["model_info"],
              "--annotation_file", raw_root["splits"]])
    pkl = os.path.join(root, "threed_future_model_bedroom.pkl")
    assert os.path.isfile(pkl)

    # ---- 3+4. train tiny AEs (lat32 + "lat"), export latents -----------
    from diffuscene_tpu.cli.generate_objautoencoder import main as gen_main
    from diffuscene_tpu.cli.train_objautoencoder import main as train_main

    for latent_dim, lat_args in ((32, []), (64, ["--lat_name", "lat"])):
        cfg = _ae_config(os.path.join(root, f"ae{latent_dim}.yaml"), latent_dim)
        out = os.path.join(root, "ae_out")
        train_main([cfg, out, "--experiment_tag", f"ae{latent_dim}",
                    "--path_to_pickled_dataset", pkl,
                    "--num_samples", str(N_POINTS)])
        exp = os.path.join(out, f"ae{latent_dim}")
        assert any(d.startswith("model_") for d in os.listdir(exp))
        gen_main([cfg, exp, "--path_to_pickled_dataset", pkl,
                  "--batch_size", str(BATCH), "--num_samples", str(N_POINTS)]
                 + lat_args)
        with open(os.path.join(exp, f"lat{latent_dim}_stats.json")) as f:
            stats = json.load(f)
        assert stats["std"] > 0 and np.isfinite(stats["scale_factor"])

    # ---- 5. latents load through the reference accessor paths ----------
    from diffuscene_tpu.data.raw import parse_threed_future_models

    models = parse_threed_future_models(
        raw_root["front"], raw_root["future"], raw_root["model_info"])
    assert len(models) == len(JIDS)
    for m in models:
        assert m.raw_model_norm_pc_lat32().shape == (32,)
        assert m.raw_model_norm_pc_lat().shape == (64,)

    # ---- 6. preprocess with --add_objfeats -----------------------------
    from diffuscene_tpu.cli.preprocess_data import main as prep_main

    cached = os.path.join(root, "cached")
    prep_main([cached, raw_root["front"], raw_root["future"], raw_root["model_info"],
               "--annotation_file", raw_root["splits"],
               "--dataset_filtering", "threed_front_bedroom",
               "--add_objfeats", "--room_mask_size", "64"])
    with open(os.path.join(cached, "dataset_stats.txt")) as f:
        ds_stats = json.load(f)
    assert len(ds_stats["bounds_objfeats_32"]) == 3
    assert ds_stats["bounds_objfeats_32"][0] > 0  # std of real latents
    room_dirs = [d for d in os.listdir(cached) if os.path.isdir(os.path.join(cached, d))]
    assert len(room_dirs) == N_ROOMS_TRAIN + N_ROOMS_TEST
    D = np.load(os.path.join(cached, room_dirs[0], "boxes.npz"))
    assert D["objfeats_32"].shape[1] == 32
    assert D["objfeats"].shape[1] == 64

    # ---- 7. a train_diffusion step consumes the regenerated objfeats ---
    import yaml

    from diffuscene_tpu.cli.train_diffusion import main as diff_main

    # the diffusion encoding drops the "start" one-hot column
    # (data/encoding.py diffusion_collate), keeping C-1 class dims
    class_dim = len(ds_stats["class_labels"]) - 1
    point_dim = class_dim + 3 + 3 + 2 + 32
    cfg = {
        "data": {
            "dataset_type": "cached_threedfront",
            "encoding_type": "cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm",
            "dataset_directory": cached,
            "annotation_file": raw_root["splits"],
            "augmentations": ["fixed_rotations"],
            "train_stats": "dataset_stats.txt",
            "room_layout_size": "64,64",
            "max_length": 12,
        },
        "network": {
            "type": "diffusion_scene_layout_ddpm",
            "net_type": "unet1d",
            "point_dim": point_dim,
            "room_mask_condition": False,
            "sample_num_points": 12,
            "objectness_dim": 0,
            "class_dim": class_dim,
            "angle_dim": 2,
            "objfeat_dim": 32,
            "learnable_embedding": True,
            "instance_condition": True,
            "instance_emb_dim": 16,
            "diffusion_kwargs": {
                "schedule_type": "linear", "time_num": 8,
                "model_mean_type": "eps", "model_var_type": "fixedsmall",
                "loss_separate": True, "loss_iou": False,
            },
            "net_kwargs": {
                "dim": 32, "dim_mults": [1, 1], "channels": point_dim,
                "objectness_dim": 0, "class_dim": class_dim, "angle_dim": 2,
                "objfeat_dim": 32, "context_dim": 0, "instanclass_dim": 16,
                "seperate_all": True,
            },
        },
        "feature_extractor": {"name": "resnet18", "feature_size": 64},
        "training": {
            "splits": ["train", "val"], "epochs": 1, "batch_size": BATCH,
            "save_frequency": 1, "max_grad_norm": 10, "optimizer": "Adam",
            "schedule": "step", "lr": 2e-4, "lr_step": 10000, "lr_decay": 0.5,
        },
        "validation": {"splits": ["test"], "frequency": 1, "batch_size": BATCH},
        "logger": {"type": "stats"},
    }
    cfg_path = os.path.join(root, "diffusion.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = os.path.join(root, "diff_out")
    diff_main([cfg_path, out, "--experiment_tag", "chain", "--seed", "0"])
    exp = os.path.join(out, "chain")
    assert any(d.startswith("model_") for d in os.listdir(exp))
    assert os.path.isfile(os.path.join(exp, "stats.txt"))


def test_pointcloud_cli_split_mode(raw_root):
    """The reference's per-split catalog mode
    (pickle_threed_fucture_pointcloud.py:105-187): objects are collected per
    split through the scene filter, npzs carry points/normals/loc/scale
    (float16 like the reference :161-175), and lst files + per-model PLYs
    land under threed_future_pointcloud_<room>/."""
    from diffuscene_tpu.cli.pickle_threed_future_pointcloud import main as pc_main

    root = raw_root["root"]
    out = os.path.join(root, "pc_split_out")
    pc_main([out, raw_root["front"], raw_root["future"], raw_root["model_info"],
             "--annotation_file", raw_root["splits"],
             "--pointcloud_size", str(N_POINTS), "--bbox_padding", "0.1"])
    pc_dir = os.path.join(out, "threed_future_pointcloud_bedroom")
    for split in ("train", "val", "test"):
        assert os.path.isfile(os.path.join(pc_dir, f"{split}.lst"))
    train_jids = [l.strip() for l in open(os.path.join(pc_dir, "train.lst")) if l.strip()]
    assert train_jids, "train split collected no objects"
    for jid in train_jids:
        assert os.path.isfile(os.path.join(pc_dir, f"{jid}.ply"))
        d = np.load(os.path.join(raw_root["future"], jid, "raw_model_norm_pc.npz"))
        assert d["points"].dtype == np.float16 and d["points"].shape == (N_POINTS, 3)
        assert d["normals"].shape == (N_POINTS, 3)
        assert d["loc"].shape == (3,) and float(d["scale"]) > 0
        # bbox_padding=0.1: longest side normalized to 1 - 0.1 = 0.9
        ext = (d["points"].astype(np.float32).max(0)
               - d["points"].astype(np.float32).min(0))
        assert ext.max() <= 0.9 + 1e-2
