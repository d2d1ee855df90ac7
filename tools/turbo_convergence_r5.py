"""Convergence validation of the fast-train recipe (bf16_turbo: fused
low-precision Adam + bf16 grads + WSDense fast VJP + tanh GELU) against the
reference-exact bf16 recipe, on real TPU (VERDICT r4 Next #1 'validate
convergence on the full-dress rehearsal recipe').

Trains TWO identical-init models on the SAME synthetic-bedroom batch stream
(structured data from make_synthetic_cached_dataset, encoded by the real
pipeline) and compares the loss trajectories.  The low-precision recipe is
accepted if its smoothed final loss is within a few percent of baseline.

Usage: python tools/turbo_convergence_r5.py [steps] [out.json]
"""
import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/turbo_convergence_r5.json"
B = 128
SPD = 16  # steps per scan dispatch

from diffuscene_tpu.data import make_synthetic_cached_dataset
from diffuscene_tpu.data.factory import get_dataset_raw_and_encoded
from diffuscene_tpu.data.loader import DataLoader
from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.train import Trainer

data_dir = tempfile.mkdtemp(prefix="turbo_conv_")
make_synthetic_cached_dataset(data_dir, n_scenes=512, max_objects=12, seed=0)
data_cfg = {
    "dataset_type": "cached_threedfront",
    "encoding_type": "cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm",
    "dataset_directory": data_dir,
    "annotation_file": f"{data_dir}/splits.csv",
    "augmentations": ["fixed_rotations"],
    "train_stats": "dataset_stats.txt",
    "max_length": 12,
}
_, train_ds = get_dataset_raw_and_encoded(
    data_cfg, augmentations=["fixed_rotations"], split=["train", "val"], seed=0)
bounds = train_ds.bounds.as_device_bounds()
loader = DataLoader(train_ds, B, shuffle=True, seed=0)

# dim-256 model: full structure, fast compiles; identical for both recipes
# except the turbo flags
def build(variant):
    net_kwargs = dict(
        dim=256, dim_mults=(1, 1, 1, 1), channels=62, objectness_dim=0,
        class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
        instanclass_dim=128, seperate_all=True, compute_dtype=jnp.bfloat16,
    )
    tcfg = {"optimizer": "Adam", "lr": 2e-4, "schedule": "step",
            "lr_step": 10000, "lr_decay": 0.5, "max_grad_norm": 10.0}
    if variant == "turbo":
        net_kwargs.update(exact_gelu=False, ws_fast_vjp=True)
        tcfg.update(fused_adam=True, adam_moment_dtype="bfloat16",
                    grads_dtype="bfloat16")
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=128,
        model_mean_type="v", time_num=1000, loss_separate=True, loss_iou=True,
        net_kwargs=tuple(sorted(net_kwargs.items())),
    )
    scene = SceneDiffusion(cfg, bounds=bounds)
    trainer = Trainer(scene, tcfg, steps_per_epoch=max(len(loader), 1))
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, state


# one shared batch stream: materialize the epoch batches once, cycle chunks
host_batches = []
while len(host_batches) * B < 40 * B:
    for hb in loader:
        host_batches.append(hb)
        if len(host_batches) * B >= 40 * B:
            break

results = {"steps": STEPS, "B": B, "spd": SPD, "curves": {}}
for variant in ("baseline", "turbo"):
    trainer, state = build(variant)
    key = jax.random.PRNGKey(1)
    losses = []
    t0 = time.perf_counter()
    n_disp = STEPS // SPD
    for d in range(n_disp):
        chunk = [host_batches[(d * SPD + i) % len(host_batches)] for i in range(SPD)]
        state, m = trainer.train_step_scan(state, trainer.put_batches(chunk), key)
        losses.append(float(m["loss"]))
        if d % 10 == 0:
            print(f"{variant} disp {d}/{n_disp} loss {losses[-1]:.4f}", flush=True)
    wall = time.perf_counter() - t0
    results["curves"][variant] = {
        "losses_per_dispatch": [round(l, 5) for l in losses],
        "final_mean_last10": round(float(np.mean(losses[-10:])), 5),
        "wall_seconds": round(wall, 1),
    }
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)

b = results["curves"]["baseline"]["final_mean_last10"]
t = results["curves"]["turbo"]["final_mean_last10"]
results["rel_final_loss_gap"] = round((t - b) / abs(b), 5)
with open(OUT, "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps({"baseline_final": b, "turbo_final": t,
                  "rel_gap": results["rel_final_loss_gap"]}), flush=True)
