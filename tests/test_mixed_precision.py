"""Mixed-precision train step (Trainer(mixed_precision=True)).

The option hoists the f32->bf16 param casts out of value_and_grad (the
serving-engine treatment applied to training).  Because the transpose of a
cast is the reverse cast, gradients are mathematically identical to the
in-forward-cast formulation up to bf16 rounding of the weight-
standardization moments — so one optimizer step from the same state must
land within bf16 tolerance of the plain path.
"""
import numpy as np
import jax
import jax.numpy as jnp

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.train import Trainer

B, N_OBJ, POINT_DIM = 16, 12, 62


def bf16_config():
    net_kwargs = dict(
        dim=32, dim_mults=(1, 1), channels=POINT_DIM, objectness_dim=0,
        class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
        instanclass_dim=16, seperate_all=True, compute_dtype=jnp.bfloat16,
    )
    return SceneModelConfig(
        point_dim=POINT_DIM, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=N_OBJ, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", time_num=50, loss_separate=True, loss_iou=False,
        net_kwargs=tuple(sorted(net_kwargs.items())),
    )


def make_batch(trainer):
    rng = np.random.default_rng(0)
    return trainer.put_batch({
        "translations": rng.uniform(-1, 1, (B, N_OBJ, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, N_OBJ, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, N_OBJ, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, N_OBJ, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, N_OBJ, 32)).astype(np.float32),
    })


def test_mixed_precision_step_matches_plain():
    cfg = bf16_config()
    tcfg = {"optimizer": "Adam", "lr": 2e-4, "max_grad_norm": 10.0}
    key = jax.random.PRNGKey(1)

    results = {}
    for mp in (False, True):
        scene = SceneDiffusion(cfg)
        trainer = Trainer(scene, tcfg, mixed_precision=mp)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = make_batch(trainer)
        state, metrics = trainer.train_step(state, batch, key)
        results[mp] = (
            jax.device_get(metrics["loss"]),
            jax.device_get(state.params),
        )

    loss_plain, params_plain = results[False]
    loss_mp, params_mp = results[True]
    assert np.isfinite(loss_mp)
    # bf16 rounding of the WS moments is the only numeric difference
    assert abs(loss_mp - loss_plain) <= 2e-2 * max(1.0, abs(loss_plain))
    # the first Adam update is bounded elementwise by ~lr, so the two paths
    # can differ by at most ~2*lr on any element (a sign flip, which only
    # happens where the true grad is near zero); almost all elements must
    # agree much more tightly
    lr = 2e-4
    flat_p, _ = jax.tree.flatten(params_plain)
    flat_m, _ = jax.tree.flatten(params_mp)
    n_total = n_loose = 0
    for a, b in zip(flat_p, flat_m):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        assert d.max() <= 2.05 * lr
        n_total += d.size
        n_loose += int((d > 0.5 * lr).sum())
    assert n_loose / n_total < 0.02, (n_loose, n_total)


def test_mixed_precision_param_dtypes_stay_f32():
    scene = SceneDiffusion(bf16_config())
    trainer = Trainer(scene, {"optimizer": "Adam", "lr": 2e-4}, mixed_precision=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(trainer)
    state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype != jnp.bfloat16
