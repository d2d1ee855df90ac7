"""End-to-end slice test: synthetic cached data -> train steps -> sampling.

The minimal bedroom pipeline from SURVEY.md §7, scaled down for CPU test speed.
Also exercises the 8-virtual-device data-parallel mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuscene_tpu.data import (
    CachedThreedFront,
    DataLoader,
    EncodedDataset,
    build_encoding,
    make_synthetic_cached_dataset,
)
from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.parallel import make_mesh
from diffuscene_tpu.train import Trainer

DIM = 32
N_OBJ = 12
POINT_DIM = 62  # 3+3+2+22+32


def small_config(**over):
    net_kwargs = dict(
        dim=DIM, dim_mults=(1, 1, 1, 1), channels=POINT_DIM,
        objectness_dim=0, class_dim=22, angle_dim=2, objfeat_dim=32,
        context_dim=0, instanclass_dim=16, seperate_all=True,
    )
    base = dict(
        point_dim=POINT_DIM, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=N_OBJ, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", loss_separate=True, loss_iou=True,
        time_num=50,  # short chain for test speed
        net_kwargs=tuple(sorted(net_kwargs.items())),
    )
    base.update(over)
    return SceneModelConfig(**base)


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    make_synthetic_cached_dataset(str(d), n_scenes=16, max_objects=N_OBJ)
    raw = CachedThreedFront(str(d), {"train_stats": "dataset_stats.txt", "max_length": N_OBJ},
                            scene_ids=[f"{i:08x}-0000-0000-0000-000000000000" for i in range(16)])
    enc = build_encoding(
        "cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm",
        raw.bounds, raw.max_length, raw.class_labels, raw.class_frequencies,
        augmentations=["fixed_rotations"],
    )
    return EncodedDataset(raw, enc)


def test_dataset_shapes_and_ranges(synth_dataset):
    s = synth_dataset[0]
    assert s["class_labels"].shape == (N_OBJ, 22)
    assert s["translations"].shape == (N_OBJ, 3)
    assert s["sizes"].shape == (N_OBJ, 3)
    assert s["angles"].shape == (N_OBJ, 2)
    assert s["objfeats_32"].shape == (N_OBJ, 32)
    # classes are exactly +-1, padded slots have empty channel == +1
    assert set(np.unique(s["class_labels"])) <= {-1.0, 1.0}
    L = int(s["length"])
    assert (s["class_labels"][L:, -1] == 1.0).all()
    # scaled attrs within [-1, 1]
    for k in ("translations", "sizes", "angles"):
        assert np.abs(s[k]).max() <= 1.0 + 1e-5


def test_loader_batches(synth_dataset):
    dl = DataLoader(synth_dataset, batch_size=8, seed=0)
    batch = next(iter(dl))
    assert batch["translations"].shape == (8, N_OBJ, 3)
    assert batch["class_labels"].shape == (8, N_OBJ, 22)


@pytest.fixture(scope="module")
def trainer_and_state(synth_dataset):
    cfg = small_config()
    scene = SceneDiffusion(cfg, bounds=synth_dataset.bounds.as_device_bounds())
    mesh = make_mesh(n_data=8, n_model=1)
    trainer = Trainer(scene, {"optimizer": "Adam", "lr": 1e-3, "schedule": "step",
                              "lr_step": 100, "lr_decay": 0.5, "max_grad_norm": 10},
                      mesh=mesh, steps_per_epoch=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, state, scene


def test_train_steps_decrease_loss(synth_dataset, trainer_and_state):
    trainer, _, scene = trainer_and_state
    # own state: train_step donates its input state buffers
    state = trainer.init_state(jax.random.PRNGKey(7))
    dl = DataLoader(synth_dataset, batch_size=8, seed=1)
    key = jax.random.PRNGKey(42)
    losses = []
    it = dl.infinite()
    for i in range(8):
        batch = trainer.put_batch(next(it))
        state, metrics = trainer.train_step(state, batch, key)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    # loss should drop substantially from the first step on this tiny set
    assert losses[-1] < losses[0]
    for k in ("loss.bbox", "loss.class", "loss.objfeat", "loss.liou", "gradnorm"):
        assert k in metrics


def test_sampling_shapes_and_descale(synth_dataset, trainer_and_state):
    trainer, state, scene = trainer_and_state
    samples = scene.sample(state.params, jax.random.PRNGKey(0), batch_size=4,
                           clip_denoised=True)
    assert samples.shape == (4, N_OBJ, POINT_DIM)
    assert np.isfinite(np.asarray(samples)).all()

    parts = scene.split_samples(samples)
    assert parts["translations"].shape == (4, N_OBJ, 3)
    assert parts["class_labels"].shape == (4, N_OBJ, 21)
    assert parts["is_empty"].shape == (4, N_OBJ)

    post = synth_dataset.post_process(
        {k: np.asarray(v) for k, v in parts.items() if k != "is_empty"}
    )
    # descaled angles are radians
    assert post["angles"].shape == (4, N_OBJ, 1)
    assert np.abs(post["angles"]).max() <= np.pi + 1e-4


def test_ddim_sampling(synth_dataset, trainer_and_state):
    trainer, state, scene = trainer_and_state
    samples = scene.sample(state.params, jax.random.PRNGKey(1), batch_size=2,
                           clip_denoised=True, ddim=True, ddim_steps=10)
    assert samples.shape == (2, N_OBJ, POINT_DIM)
    assert np.isfinite(np.asarray(samples)).all()


def test_trajectory_sampling(synth_dataset, trainer_and_state):
    trainer, state, scene = trainer_and_state
    traj = scene.sample(state.params, jax.random.PRNGKey(2), batch_size=2,
                        clip_denoised=True, ret_traj=True, freq=10)
    # 50 steps / freq 10 -> init + post-(t=T-1) frame + 5 modulo frames
    # (reference-exact emit set, diffusion_ddpm.py:396)
    assert traj.shape == (7, 2, N_OBJ, POINT_DIM)


def test_validation_step(synth_dataset, trainer_and_state):
    trainer, state, scene = trainer_and_state
    dl = DataLoader(synth_dataset, batch_size=8, seed=3)
    batch = trainer.put_batch(next(iter(dl)))
    metrics = trainer.eval_step(state, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(metrics["loss"]))
