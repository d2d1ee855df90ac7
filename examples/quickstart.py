#!/usr/bin/env python
"""Quickstart: the full pipeline on a synthetic dataset, no downloads.

Covers, in one script (~2 min on CPU, seconds on TPU):
  1. generate a synthetic cached dataset (boxes.npz format)
  2. train the scene diffusion model for a few steps
  3. checkpoint + resume
  4. sample scenes (batched jitted 1000-step -> here 24-step scan)
  5. post-process (descale + empty-slot filtering) and render top-down PNGs
  6. scene metrics (categorical KL, intersections, symmetry)

Run:  python examples/quickstart.py [out_dir]
"""
import json
import os
import sys
import tempfile

import jax
import numpy as np

from diffuscene_tpu.data import make_synthetic_cached_dataset
from diffuscene_tpu.data.factory import get_dataset_raw_and_encoded
from diffuscene_tpu.data.loader import DataLoader
from diffuscene_tpu.eval import (
    categorical_kl, compute_intersection, render_scene_dict, save_image,
    scene_bboxes_from_params, split_network_samples,
)
from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.train import Trainer
from diffuscene_tpu.utils import load_checkpoint, save_checkpoint


def main(out_dir=None):
    out_dir = out_dir or tempfile.mkdtemp(prefix="diffuscene_quickstart_")
    data_dir = os.path.join(out_dir, "cached")
    print(f"[1/6] synthetic dataset -> {data_dir}")
    make_synthetic_cached_dataset(data_dir, n_scenes=64, max_objects=12, seed=0)

    raw, ds = get_dataset_raw_and_encoded(
        {
            "dataset_type": "cached_threedfront",
            "encoding_type": "cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm",
            "dataset_directory": data_dir,
            "annotation_file": os.path.join(data_dir, "splits.csv"),
            "augmentations": ["fixed_rotations"],
            "max_length": 12,
        },
        split=["train", "val", "test"],
    )
    loader = DataLoader(ds, batch_size=8, seed=0)

    print("[2/6] train a small model")
    nk = dict(dim=64, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
              instanclass_dim=16, seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", time_num=24, loss_separate=True, loss_iou=True,
        net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg, bounds=ds.bounds.as_device_bounds())
    trainer = Trainer(scene, {"optimizer": "Adam", "lr": 2e-4, "schedule": "step",
                              "lr_step": 10000, "lr_decay": 0.5, "max_grad_norm": 10.0})
    state = trainer.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    it = loader.infinite()
    for i in range(40):
        state, metrics = trainer.train_step(state, trainer.put_batch(next(it)), key)
    print(f"      loss after 40 steps: {float(metrics['loss']):.4f}")

    print("[3/6] checkpoint + resume")
    exp = os.path.join(out_dir, "exp")
    save_checkpoint(state, exp, epoch=1)
    state, epoch = load_checkpoint(state, exp)
    print(f"      resumed from epoch {epoch}")

    print("[4/6] sample 16 scenes (one jitted scan, fused serving engine)")
    samples = np.asarray(jax.jit(
        lambda p, k: scene.sample(p, k, batch_size=16, clip_denoised=True,
                                  fused=True)
    )(state.params, jax.random.PRNGKey(2)))
    # fast alternative: DPM-Solver++(2M) in ~8 steps instead of the full chain
    _ = jax.jit(
        lambda p, k: scene.sample(p, k, batch_size=16, clip_denoised=True,
                                  dpm=True, dpm_steps=8, fused=True)
    )(state.params, jax.random.PRNGKey(3))

    print("[5/6] post-process + render")
    scenes = split_network_samples(scene.spec, samples)
    render_dir = os.path.join(out_dir, "renders")
    os.makedirs(render_dir, exist_ok=True)
    for i, boxes in enumerate(scenes[:4]):
        boxes = ds.post_process(boxes)
        save_image(render_scene_dict(boxes), os.path.join(render_dir, f"{i:03d}.png"))
    print(f"      4 renders -> {render_dir}")

    print("[6/6] metrics")
    cls_gen = np.zeros(len(raw.object_types))
    stats = []
    for boxes in scenes:
        boxes = ds.post_process(boxes)
        cls = np.asarray(boxes["class_labels"])
        for c in cls.argmax(-1):
            cls_gen[c] += 1
        bb = scene_bboxes_from_params(np.asarray(boxes["translations"]),
                                      np.asarray(boxes["sizes"]))
        stats.append(compute_intersection(bb))
    gt = np.array([raw.class_frequencies[c] for c in raw.object_types])
    report = {
        "categorical_kl": categorical_kl(gt / gt.sum(), cls_gen / max(cls_gen.sum(), 1) + 1e-9),
        "mean_objects": float(np.mean([s[0] for s in stats])),
        "mean_overlap_ratio": float(np.mean([s[4] for s in stats])),
    }
    print("      " + json.dumps(report))
    print(f"done. artifacts under {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
