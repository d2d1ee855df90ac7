"""The flop-counting convention `bench.py mfu train` relies on.

`train_mfu_metric` reads XLA's cost analysis of the k-step
`Trainer.train_step_scan` program and reports its flop total as the
PER-STEP count: HloCostAnalysis visits a while-loop body once regardless
of trip count, so the scan program's flops equal one body execution (plus
negligible prologue), NOT k of them.  If an XLA upgrade ever starts
multiplying by trip count, the bench's MFU would silently inflate by k —
this test pins the convention (scan-total ≈ single-step, and in
particular scan-total ≪ k × single-step).
"""
import jax
import numpy as np

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.train import Trainer

BASE_CFG = {"optimizer": "Adam", "lr": 1e-3, "schedule": "step",
            "lr_step": 1000, "lr_decay": 0.5, "max_grad_norm": 10.0}


def tiny_scene():
    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
              instanclass_dim=16, seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", time_num=8, loss_separate=True, loss_iou=False,
        net_kwargs=tuple(sorted(nk.items())))
    return SceneDiffusion(cfg)


def make_host_batch(B=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "translations": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, 12, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, 12, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, 12, 32)).astype(np.float32),
    }


def _flops(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def test_scan_cost_analysis_counts_body_once():
    k, B = 4, 8
    trainer = Trainer(tiny_scene(), dict(BASE_CFG))
    state = trainer.init_state(jax.random.PRNGKey(0))
    host = make_host_batch(B=B)
    batch = trainer.put_batch(host)
    stacked = trainer.put_batches([host for _ in range(k)])
    key = jax.random.PRNGKey(1)

    # settle arg specs the way the bench does (donated programs: keep the
    # returned state); then AOT-lower both programs for cost analysis
    state1, _ = trainer.train_step(state, batch, key)
    single = trainer._train_step.lower(state1, batch, key).compile()
    state2, _ = trainer.train_step_scan(state1, stacked, key)
    scan = trainer._train_scan_cache[k].lower(state2, stacked, key).compile()

    f_single, f_scan = _flops(single), _flops(scan)
    assert f_single > 0 and f_scan > 0
    # body-once: the scan's total is one step's flops, not k steps'
    np.testing.assert_allclose(f_scan, f_single, rtol=0.05)
    assert f_scan < 0.5 * k * f_single
