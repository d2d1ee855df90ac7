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

    # bf16 activations (params stay f32) + large batch: measured on v5e,
    # bf16 B=512 gives ~99 scenes/s vs 73 at f32 B=64 (see git history)
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

    B = 512  # scenes sampled per program (throughput-optimal on one v5e chip)

    def sample(params, key):
        return scene.sample(params, key, batch_size=B, clip_denoised=True)

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


if __name__ == "__main__":
    main()
