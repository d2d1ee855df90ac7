"""EMA-pass cost on the full-size train step (round 5).

The bench train variants run WITHOUT EMA; production configs enable it
(training.ema_decay).  The EMA update is 3 extra params-sized HBM passes
per step (read e, read p, write e ~= 0.9 GB at 77.7M f32 params); storing
the EMA bf16 (training.ema_dtype) halves the e traffic.  This measures
full bf16_turbo steps at B=128 with no EMA / f32 EMA / bf16 EMA via
k-scan windows.

Usage: python tools/ema_cost_r5.py [k] [out.json]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ema_cost_r5.json"
B = 128
N_WINDOWS = 4

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.train import Trainer

results = {"k": K, "B": B, "device": str(jax.devices()[0]), "rows": {}}


def build(ema_cfg):
    net_kwargs = dict(
        dim=512, dim_mults=(1, 1, 1, 1), channels=62, objectness_dim=0,
        class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
        instanclass_dim=128, seperate_all=True, compute_dtype=jnp.bfloat16,
        exact_gelu=False, ws_fast_vjp=True,
    )
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=128,
        model_mean_type="v", time_num=1000, loss_separate=True, loss_iou=True,
        net_kwargs=tuple(sorted(net_kwargs.items())),
    )
    bounds = {
        "translations_min": np.array([-3, 0, -3], np.float32),
        "translations_max": np.array([3, 4, 3], np.float32),
        "sizes_min": np.full(3, 0.04, np.float32),
        "sizes_max": np.full(3, 2.0, np.float32),
    }
    scene = SceneDiffusion(cfg, bounds=bounds)
    tcfg = {"optimizer": "Adam", "lr": 2e-4, "schedule": "step",
            "lr_step": 10000, "lr_decay": 0.5, "max_grad_norm": 10.0,
            "fused_adam": True, "adam_moment_dtype": "bfloat16",
            "grads_dtype": "bfloat16"}
    tcfg.update(ema_cfg)
    trainer = Trainer(scene, tcfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, state


def stacked_batches(trainer):
    rng = np.random.default_rng(7)
    return trainer.put_batches([{
        "translations": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, 12, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, 12, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, 12, 32)).astype(np.float32),
    } for _ in range(K)])


for label, ema_cfg in (("no_ema", {}),
                       ("ema_f32", {"ema_decay": 0.9999}),
                       ("ema_bf16", {"ema_decay": 0.9999,
                                     "ema_dtype": "bfloat16"})):
    trainer, state = build(ema_cfg)
    stacked = stacked_batches(trainer)
    key = jax.random.PRNGKey(1)
    holder = {"state": state}

    def run():
        s, m = trainer.train_step_scan(holder["state"], stacked, key)
        holder["state"] = s
        return m["loss"]

    run()
    run()
    windows = []
    for _ in range(N_WINDOWS):
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        windows.append((time.perf_counter() - t0) / K * 1e3)
    results["rows"][label] = {
        "ms_per_step_best": round(min(windows), 4),
        "windows_ms": [round(w, 4) for w in windows],
    }
    print(label, results["rows"][label], flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)

print("DONE", OUT, flush=True)
