"""PackedDataLoader (native encoder) -> Trainer fast path end-to-end."""
import jax
import numpy as np
import pytest

from diffuscene_tpu.data import CachedThreedFront, make_synthetic_cached_dataset
from diffuscene_tpu.data.loader import PackedDataLoader
from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.train import Trainer

native = pytest.importorskip("diffuscene_tpu.native")
if not native.native_available():
    pytest.skip("native batcher unavailable", allow_module_level=True)


def test_packed_loader_train_step(tmp_path):
    data_dir = str(tmp_path / "cached")
    make_synthetic_cached_dataset(data_dir, n_scenes=24, max_objects=12, seed=0)
    ids = [f"{i:08x}-0000-0000-0000-000000000000" for i in range(24)]
    raw = CachedThreedFront(data_dir, {"max_length": 12}, ids)
    assert len(raw) == 24

    loader = PackedDataLoader(raw, raw.bounds, max_length=12,
                              n_classes=raw.n_classes, batch_size=8, seed=0)
    assert len(loader) == 3
    batch = next(iter(loader))
    assert batch["packed"].shape == (8, 12, 62)
    assert np.abs(batch["packed"]).max() <= 1.0 + 1e-5

    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
              instanclass_dim=16, seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", time_num=8, loss_iou=False,
        net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    trainer = Trainer(scene, {"optimizer": "Adam", "lr": 1e-4, "schedule": "step",
                              "lr_step": 1000, "lr_decay": 0.5, "max_grad_norm": 10.0})
    state = trainer.init_state(jax.random.PRNGKey(0))
    dbatch = trainer.put_batch(batch)
    assert "packed" in dbatch
    state, metrics = trainer.train_step(state, dbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
