"""Room-mask conditioning end-to-end: frozen-BN ResNet18 -> fc_room_f ->
condition vector; train step + sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.models.feature_extractors import AlexNet, ResNet18, get_feature_extractor
from diffuscene_tpu.train import Trainer


def test_feature_extractors_shapes():
    for name, cls in [("resnet18", ResNet18), ("alexnet", AlexNet)]:
        net = get_feature_extractor(name, feature_size=32, input_channels=1)
        assert isinstance(net, cls)
        x = jnp.zeros((2, 64, 64, 1))
        variables = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(variables, x)
        assert out.shape == (2, 32)
        # NCHW inputs are accepted for reference parity
        out2 = net.apply(variables, jnp.zeros((2, 1, 64, 64)))
        assert out2.shape == (2, 32)
        # frozen BN: batch_stats exist but are never updated (no mutable
        # pass); the AlexNet variant has no BN (feature_extractors.py:47-68)
        if name == "resnet18":
            assert "batch_stats" in variables


def test_room_mask_conditioned_train_and_sample():
    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=64,
              instanclass_dim=16, seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=True,
        latent_dim=64, instance_condition=True, learnable_embedding=True,
        instance_emb_dim=16, model_mean_type="v", time_num=6, loss_iou=False,
        net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    trainer = Trainer(scene, {"optimizer": "Adam", "lr": 1e-4, "schedule": "step",
                              "lr_step": 1000, "lr_decay": 0.5, "max_grad_norm": 10.0})
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 8
    batch = trainer.put_batch({
        "translations": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, 12, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, 12, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, 12, 32)).astype(np.float32),
        "room_layout": (rng.random((B, 64, 64, 1)) > 0.5).astype(np.float32),
    })
    state, m = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    out = jax.jit(lambda p, k, rl: scene.sample(
        p, k, batch_size=B, room_layout=rl, clip_denoised=True))(
        state.params, jax.random.PRNGKey(2), batch["room_layout"])
    assert out.shape == (B, 12, 62)
    assert np.isfinite(np.asarray(out)).all()
    # different masks -> different conditioning -> different samples
    other = jax.jit(lambda p, k, rl: scene.sample(
        p, k, batch_size=B, room_layout=rl, clip_denoised=True))(
        state.params, jax.random.PRNGKey(2), 1.0 - batch["room_layout"])
    assert not np.allclose(np.asarray(out), np.asarray(other))
