"""Network factory: config dict -> model object.

Equivalent of reference `build_network` (`scene_synthesis/networks/
__init__.py:37-68`), dispatching on ``network.type``.  Optimizer/schedule
factories live in `train/optim.py` (networks/__init__.py:15-34,78-168).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .autoencoder import KLAutoEncoder
from .scene_model import SceneDiffusion, SceneModelConfig


def build_network(n_classes: int, config: Dict[str, Any],
                  weight_file: Optional[str] = None,
                  bounds: Optional[Dict[str, np.ndarray]] = None):
    """Build the model named by ``config['network']['type']``.

    - 'diffusion_scene_layout_ddpm' -> SceneDiffusion (+ params from a torch
      .pt via the converter when ``weight_file`` ends in .pt/.pth)
    - 'objautoencoder' / 'autoencoder' -> KLAutoEncoder

    Returns (model, params_or_None).
    """
    network = config["network"]
    net_type = network.get("type", "diffusion_scene_layout_ddpm")

    if net_type == "diffusion_scene_layout_ddpm":
        cfg = SceneModelConfig.from_config(network)
        model = SceneDiffusion(cfg, bounds=bounds)
        params = None
        if weight_file and weight_file.endswith((".pt", ".pth")):
            from ..utils.convert import convert_scene_model, load_torch_checkpoint

            params = convert_scene_model(load_torch_checkpoint(weight_file))
        return model, params

    if net_type in ("objautoencoder", "autoencoder", "kl_autoencoder"):
        model = KLAutoEncoder(
            latent_dim=int(network.get("objfeat_dim", 64)),
            kl_weight=float(network.get("kl_weight", 0.001)),
        )
        return model, None

    raise NotImplementedError(f"unknown network type: {net_type}")
