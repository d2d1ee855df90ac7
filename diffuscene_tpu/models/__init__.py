from .denoiser import Unet1D
from .scene_model import (
    ConditionNets,
    SceneDiffusion,
    SceneModelConfig,
    SceneNetworks,
    pack_target,
)
