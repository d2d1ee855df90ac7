"""North-star benchmark: scenes/sec for 1000-step DDPM bedroom sampling.

Reference procedure (BASELINE.md): 1000 DDPM steps, full-size denoiser
(dim=512, N=12, point_dim=62), clip_denoised — but the reference runs batch 1
per scene in a Python loop (generate_diffusion.py:294, diffusion_ddpm.py:355).
Here the whole 1000-step chain is one jitted `lax.scan` batched over many
scenes on one TPU chip.

Baseline constant: the repo publishes no numbers (BASELINE.json
"published": {}); we document the reference estimate as 0.25 scenes/sec on a
single modern GPU (1000 sequential UNet evals at batch 1, ~4ms each), which is
generous to the reference.  `vs_baseline` = our scenes/sec / 0.25.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SCENES_PER_SEC = 0.25  # documented estimate, see module docstring


def main():
    import jax
    import jax.numpy as jnp
    from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig

    # bf16 activations (params stay f32) + large batch + the fused serving
    # engine (models/inference.py: hoisted weight standardization, time-FiLM
    # tables, 2-D block-masked attention, one-pass f32 GN moments) — measured
    # on v5e: ~164 scenes/s at B=768 vs ~99 for the plain Flax forward
    net_kwargs = dict(
        dim=512, dim_mults=(1, 1, 1, 1), channels=62, objectness_dim=0,
        class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
        instanclass_dim=128, seperate_all=True, compute_dtype=jnp.bfloat16,
    )
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=128,
        model_mean_type="v", model_var_type="fixedsmall",
        schedule_type="linear", beta_start=1e-4, beta_end=0.02, time_num=1000,
        loss_separate=True, loss_iou=False,
        net_kwargs=tuple(sorted(net_kwargs.items())),
    )
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0), batch_size=2)

    B = 768  # scenes sampled per program (throughput-optimal on one v5e chip)

    def sample(params, key):
        return scene.sample(params, key, batch_size=B, clip_denoised=True, fused=True)

    sample_jit = jax.jit(sample)

    # warmup/compile
    out = sample_jit(params, jax.random.PRNGKey(1))
    out.block_until_ready()

    n_runs = 2
    t0 = time.perf_counter()
    for i in range(n_runs):
        out = sample_jit(params, jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    scenes_per_sec = B * n_runs / dt
    print(
        json.dumps(
            {
                "metric": "bedroom_ddpm1000_scenes_per_sec",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/sec",
                "vs_baseline": round(scenes_per_sec / REFERENCE_SCENES_PER_SEC, 2),
            }
        )
    )


def train_metric():
    """Optional secondary benchmark: train steps/sec at the reference recipe
    (batch 128, IoU loss).  Run with `python bench.py train`."""
    import time

    import jax
    from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
    from diffuscene_tpu.train import Trainer

    net_kwargs = dict(
        dim=512, dim_mults=(1, 1, 1, 1), channels=62, objectness_dim=0,
        class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
        instanclass_dim=128, seperate_all=True,
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
    trainer = Trainer(scene, {"optimizer": "Adam", "lr": 2e-4, "schedule": "step",
                              "lr_step": 10000, "lr_decay": 0.5, "max_grad_norm": 10.0})
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 128
    batch = trainer.put_batch({
        "translations": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, 12, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, 12, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, 12, 32)).astype(np.float32),
    })
    key = jax.random.PRNGKey(1)
    for _ in range(2):  # warmup (the step compiles twice, see CLAUDE.md)
        state, m = trainer.train_step(state, batch, key)
    jax.block_until_ready(m["loss"])
    N = 100
    t0 = time.perf_counter()
    for _ in range(N):
        state, m = trainer.train_step(state, batch, key)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "bedroom_train_steps_per_sec",
        "value": round(N / dt, 3),
        "unit": "steps/sec",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "train":
        train_metric()
    else:
        main()
