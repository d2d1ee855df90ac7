"""Every shipped YAML config must parse and build a valid model setup.

Guards the config schema end-to-end: YAML -> load_config ->
SceneModelConfig.from_config -> Unet1D construction -> schedule build.
(The reference ships the same uncond/text/rearrange x room-type matrix,
config/*.yaml.)
"""
import glob
import os

import pytest

from diffuscene_tpu.models import SceneModelConfig
from diffuscene_tpu.models.scene_model import build_unet1d
from diffuscene_tpu.diffusion import make_schedule
from diffuscene_tpu.utils import load_config

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
DIFFUSION_CONFIGS = sorted(
    glob.glob(os.path.join(ROOT, "uncond", "*.yaml"))
    + glob.glob(os.path.join(ROOT, "text", "*.yaml"))
    + glob.glob(os.path.join(ROOT, "rearrange", "*.yaml"))
)
AE_CONFIGS = sorted(glob.glob(os.path.join(ROOT, "obj_autoencoder", "*.yaml")))


def test_config_matrix_is_complete():
    names = [os.path.basename(p) for p in DIFFUSION_CONFIGS]
    # uncond: v + eps x 3 room types; text + rearrange: 3 room types each
    assert len([n for n in names if "_v.yaml" in n or "_v_" in n]) >= 9
    assert len(AE_CONFIGS) >= 1


@pytest.mark.parametrize(
    "path", DIFFUSION_CONFIGS, ids=[os.path.basename(p) for p in DIFFUSION_CONFIGS]
)
def test_diffusion_config_builds(path):
    config = load_config(path)
    for section in ("data", "network", "training", "validation"):
        assert section in config, section
    cfg = SceneModelConfig.from_config(config["network"])
    # the denoiser constructs from net_kwargs without error
    net = build_unet1d(cfg)
    assert net.dim > 0
    # channel bookkeeping is consistent
    if cfg.room_arrange_condition:
        assert net.channels == cfg.translation_dim + cfg.angle_dim
    else:
        assert net.channels == cfg.point_dim
        assert (
            cfg.bbox_dim + cfg.class_dim + cfg.objectness_dim + cfg.objfeat_dim
            == cfg.point_dim
        )
    # schedule builds from the diffusion kwargs
    sched = make_schedule(cfg.schedule_type, cfg.beta_start, cfg.beta_end, cfg.time_num)
    assert sched.num_timesteps == cfg.time_num
    # room-type dimensions match the reference conventions
    name = os.path.basename(path)
    if "bedrooms" in name:
        assert cfg.sample_num_points == 12 and cfg.class_dim == 22
    if "livingrooms" in name or "diningrooms" in name:
        assert cfg.sample_num_points == 21 and cfg.class_dim == 25


@pytest.mark.parametrize(
    "path", AE_CONFIGS, ids=[os.path.basename(p) for p in AE_CONFIGS]
)
def test_ae_config_builds(path):
    config = load_config(path)
    assert "network" in config and "training" in config
    net = config["network"]
    assert int(net.get("objfeat_dim", net.get("latent_dim", 0))) > 0
