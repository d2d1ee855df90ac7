"""Tensor-parallel training on a (4 data x 2 model) virtual mesh: kernels
column-sharded over 'model', train step runs, results match replicated DP."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.parallel import make_mesh, param_shardings
from diffuscene_tpu.train import Trainer


def _scene():
    nk = dict(dim=64, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
              instanclass_dim=16, seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", time_num=8, loss_iou=False,
        net_kwargs=tuple(sorted(nk.items())))
    return SceneDiffusion(cfg)


def _batch(B=8):
    rng = np.random.default_rng(0)
    return {
        "translations": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, 12, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, 12, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, 12, 32)).astype(np.float32),
    }


def test_param_shardings_columns():
    scene = _scene()
    params = scene.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=4, n_model=2)
    sh = param_shardings(params, mesh, min_size=64 * 64)
    flat = jax.tree.leaves_with_path(sh)
    col = [1 for p, s in flat if s.spec == P(None, "model")]
    rep = [1 for p, s in flat if s.spec == P()]
    assert len(col) > 10  # the big dense kernels are sharded
    assert len(rep) > 0  # biases/norms stay replicated


def test_tp_training_matches_dp():
    scene = _scene()
    tcfg = {"optimizer": "Adam", "lr": 1e-4, "schedule": "step",
            "lr_step": 1000, "lr_decay": 0.5, "max_grad_norm": 10.0}

    dp = Trainer(scene, tcfg, mesh=make_mesh(n_data=8, n_model=1))
    st_dp = dp.init_state(jax.random.PRNGKey(0))
    b_dp = dp.put_batch(_batch())
    st_dp, m_dp = dp.train_step(st_dp, b_dp, jax.random.PRNGKey(1))

    tp = Trainer(scene, tcfg, mesh=make_mesh(n_data=4, n_model=2),
                 tensor_parallel=True)
    st_tp = tp.init_state(jax.random.PRNGKey(0))
    b_tp = tp.put_batch(_batch())
    st_tp, m_tp = tp.train_step(st_tp, b_tp, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]), rtol=1e-5)
    # a second TP step runs on the donated sharded state
    st_tp, m2 = tp.train_step(st_tp, tp.put_batch(_batch()), jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))
