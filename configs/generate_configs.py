#!/usr/bin/env python
"""Emit the shipped config set (SURVEY.md §2.5) from one parameter table.

Writes YAML configs for every reference experiment family — uncond (v/eps),
text (bert), rearrange for the three room types, plus the shape-AE configs —
using this framework's path layout.  Hyperparameters match the reference
recipes (config/uncond/*.yaml etc.); paths point at env-style placeholders
the user overrides per machine.

Run:  python configs/generate_configs.py
"""
from __future__ import annotations

import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))

ROOMS = {
    "bedrooms": dict(class_dim=22, n_points=12, splits="bedroom", epochs=60000),
    "livingrooms": dict(class_dim=25, n_points=21, splits="livingroom", epochs=150000),
    "diningrooms": dict(class_dim=25, n_points=21, splits="diningroom", epochs=150000),
}


def data_section(room: str, encoding: str) -> dict:
    return {
        "dataset_type": "cached_threedfront",
        "encoding_type": encoding,
        "dataset_directory": f"data/3d_front_processed/{room}_objfeats_32_64",
        "annotation_file": f"configs/splits/{ROOMS[room]['splits']}_threed_front_splits.csv",
        "path_to_invalid_scene_ids": "configs/splits/invalid_threed_front_rooms.txt",
        "path_to_invalid_bbox_jids": "configs/splits/black_list.txt",
        "augmentations": ["fixed_rotations"],
        "filter_fn": f"threed_front_{ROOMS[room]['splits']}",
        "train_stats": "dataset_stats.txt",
        "room_layout_size": "64,64",
        "max_length": ROOMS[room]["n_points"],
    }


def training_section(room: str, save_frequency: int = 2000) -> dict:
    return {
        "splits": ["train", "val"],
        "epochs": ROOMS[room]["epochs"],
        "steps_per_epoch": 500,
        "batch_size": 128,
        "save_frequency": save_frequency,
        "max_grad_norm": 10,
        "optimizer": "Adam",
        "weight_decay": 0.0,
        "schedule": "step",
        "lr": 0.0002,
        "lr_step": 10000,
        "lr_decay": 0.5,
    }


VALIDATION = {
    "splits": ["test"],
    "frequency": 10,
    "batch_size": 128,
    "gen_traj": False,
    "num_step": 100,
    "gen_gt": False,
    "gen_prob_map": False,
}


def network_section(room: str, mean_type: str, text: bool = False, rearrange: bool = False) -> dict:
    r = ROOMS[room]
    point_dim = 3 + 3 + 2 + r["class_dim"] + 32
    net = {
        "type": "diffusion_scene_layout_ddpm",
        "net_type": "unet1d",
        "point_dim": point_dim,
        "latent_dim": 0,
        "room_mask_condition": False,
        "sample_num_points": r["n_points"],
        "objectness_dim": 0,
        "class_dim": r["class_dim"],
        "angle_dim": 2,
        "objfeat_dim": 32,
        "learnable_embedding": True,
        "instance_condition": True,
        "instance_emb_dim": 128,
        "diffusion_kwargs": {
            "schedule_type": "linear",
            "beta_start": 0.0001,
            "beta_end": 0.02,
            "time_num": 1000,
            "loss_type": "mse",
            "model_mean_type": mean_type,
            "model_var_type": "fixedsmall",
            "loss_separate": True,
            "loss_iou": True,
        },
        "net_kwargs": {
            "dim": 512,
            "dim_mults": [1, 1, 1, 1],
            "channels": point_dim,
            "objectness_dim": 0,
            "class_dim": r["class_dim"],
            "angle_dim": 2,
            "objfeat_dim": 32,
            "context_dim": 0,
            "instanclass_dim": 128,
            "seperate_all": True,
        },
    }
    if text:
        net["text_condition"] = True
        net["text_embed_dim"] = 512
        net["net_kwargs"]["text_condition"] = True
        net["net_kwargs"]["text_dim"] = 512
    if rearrange:
        net["room_arrange_condition"] = True
        net["arrange_emb_dim"] = 384
        net["net_kwargs"]["channels"] = 5  # translations (3) + cos/sin angle (2)
        net["net_kwargs"]["instanclass_dim"] = 512  # 128 instance + 384 arrange
        net["net_kwargs"]["seperate_all"] = False
        net["net_kwargs"]["out_dim"] = 5
    return net


FEATURE_EXTRACTOR = {"name": "resnet18", "feature_size": 64, "freeze_bn": True, "input_channels": 1}


def emit(path: str, cfg: dict):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    print("wrote", path)


def main():
    lat_enc = "cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm"
    text_enc = "cached_diffusion_text_cosin_angle_objfeatsnorm_lat32_wocm"
    for room in ROOMS:
        for mean_type in ("v", "eps"):
            emit(
                os.path.join(HERE, "uncond", f"diffusion_{room}_instancond_lat32_{mean_type}.yaml"),
                {
                    "data": data_section(room, lat_enc),
                    "network": network_section(room, mean_type),
                    "feature_extractor": FEATURE_EXTRACTOR,
                    "training": training_section(room),
                    "validation": VALIDATION,
                    "logger": {"type": "stats", "project": "diffuscene_tpu"},
                },
            )
        # TPU-native large-batch recipe (no reference counterpart): B=512
        # fills the chip (~36% train MFU vs 22% at the reference's B=128,
        # docs/PERFORMANCE.md), bf16 compute + tanh-GELU + fast WS-VJP +
        # fused low-precision Adam (train/optim.fused_clip_adam), sqrt-scaled
        # LR (2e-4 * sqrt(512/128) = 4e-4) and EMA.  Convergence validated
        # vs the B=128 recipe on the synthetic full-dress fixture (EVAL
        # docs row, round 5).
        b512_training = {
            **training_section(room),
            "batch_size": 512,
            "lr": 0.0004,
            "ema_decay": 0.9999,
            # bf16 EMA storage: the EMA pass costs ~1.0 ms/step in f32
            # (3 params-sized passes), 0.6 ms stored bf16; quality-free
            # for bf16 inference (samplers cast weights to bf16 anyway)
            "ema_dtype": "bfloat16",
            "fused_adam": True,
            "adam_moment_dtype": "bfloat16",
            "grads_dtype": "bfloat16",
        }
        b512_network = network_section(room, "v")
        b512_network["net_kwargs"].update(
            compute_dtype="bfloat16", exact_gelu=False, ws_fast_vjp=True)
        emit(
            os.path.join(HERE, "uncond", f"diffusion_{room}_instancond_lat32_v_b512_tpu.yaml"),
            {
                "data": data_section(room, lat_enc),
                "network": b512_network,
                "feature_extractor": FEATURE_EXTRACTOR,
                "training": b512_training,
                "validation": VALIDATION,
                "logger": {"type": "stats", "project": "diffuscene_tpu"},
            },
        )
        emit(
            os.path.join(HERE, "text", f"diffusion_{room}_instancond_lat32_v_bert.yaml"),
            {
                "data": data_section(room, text_enc),
                "network": network_section(room, "v", text=True),
                "feature_extractor": FEATURE_EXTRACTOR,
                "training": training_section(room),
                "validation": {**VALIDATION, "gen_gt": True},
                "logger": {"type": "stats", "project": "diffuscene_tpu"},
            },
        )
        emit(
            os.path.join(HERE, "rearrange", f"diffusion_{room}_instancond_lat32_v_rearrange.yaml"),
            {
                "data": data_section(room, lat_enc),
                "network": network_section(room, "v", rearrange=True),
                "feature_extractor": FEATURE_EXTRACTOR,
                "training": training_section(room, save_frequency=100),
                "validation": VALIDATION,
                "logger": {"type": "stats", "project": "diffuscene_tpu"},
            },
        )

    # shape-AE configs (config/obj_autoencoder/*.yaml): lat32 over all rooms
    # + the 64-d variant (reference bed_living_diningrooms.yaml: objfeat_dim
    # 64, epochs 1010; the lat32 file is the shipped-pipeline default)
    for name, rooms, lat, ae_epochs in [
        ("bed_living_diningrooms_lat32",
         ["bedrooms", "livingrooms", "diningrooms"], 32, 1000),
        ("bed_living_diningrooms",
         ["bedrooms", "livingrooms", "diningrooms"], 64, 1010),
        ("bedrooms", ["bedrooms"], 32, 1000),
        ("livingrooms", ["livingrooms"], 32, 1000),
        ("diningrooms", ["diningrooms"], 32, 1000),
    ]:
        emit(
            os.path.join(HERE, "obj_autoencoder", f"{name}.yaml"),
            {
                "data": {
                    **data_section(rooms[0], "cached_diffusion_cosin_angle_wocm"),
                    "room_types": rooms,
                    "path_to_3d_future_dataset_directory": "data/3D-FUTURE-model",
                    "path_to_model_info": "data/3D-FUTURE-model/model_info.json",
                },
                "network": {"objfeat_dim": lat, "kl_weight": 0.001},
                "training": {
                    "splits": ["train", "val", "test"],
                    "epochs": ae_epochs,
                    "steps_per_epoch": 500,
                    "batch_size": 16,
                    "save_frequency": 100,
                    "max_grad_norm": 10,
                    "optimizer": "Adam",
                    "weight_decay": 0.0,
                    "schedule": "step",
                    "lr": 0.0001,
                    "lr_step": 400,
                    "lr_decay": 0.1,
                },
                "validation": {"splits": ["test"], "frequency": 10, "batch_size": 16},
                "logger": {"type": "stats", "project": "diffuscene_tpu"},
            },
        )


if __name__ == "__main__":
    main()
