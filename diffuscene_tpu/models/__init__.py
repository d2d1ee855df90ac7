from .autoencoder import (
    AutoEncoder,
    Decoder,
    Encoder,
    FoldingLayer,
    GraphLayer,
    KLAutoEncoder,
    kl_autoencoder_loss,
)
from .denoiser import Unet1D
from .scene_model import (
    ConditionNets,
    SceneDiffusion,
    SceneModelConfig,
    SceneNetworks,
    pack_target,
)
