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
from .factory import build_network
from .feature_extractors import AlexNet, FrozenBatchNorm, ResNet18, get_feature_extractor
from .scene_model import (
    ConditionNets,
    SceneDiffusion,
    SceneModelConfig,
    SceneNetworks,
    pack_target,
)
