"""Flax -> PyTorch state_dict export (the inverse of `utils/convert.py`).

Lets checkpoints trained in this framework flow back to the reference
implementation (tangjiapeng/DiffuScene): export into the state_dict layout
of the reference's `DiffusionSceneLayout_DDPM`
(`scene_synthesis/networks/diffusion_scene_layout_ddpm.py:14-129`),
`Unet1D` (`denoise_net.py:335-504`), `KLAutoEncoder`
(`foldingnet_autoencoder.py:337-390`), or the room-mask feature extractors
(`feature_extractors.py:19-68`), then `model.load_state_dict(...)` on the
torch side.

The inverse is DERIVED from the forward converter rather than hand-written,
so the two can never drift:

1.  The caller supplies a *template* state_dict (``reference_model
    .state_dict()``) that fixes the torch key set and tensor shapes.
2.  Each template tensor is replaced by a unique constant tag and run
    through the forward converter once.  Walking the resulting flax tree
    recovers, per torch key, (a) the flax leaf path it lands on and (b) any
    additive residual the forward applies (e.g. `convert_feature_extractor`
    un-bakes the FrozenBatchNorm eps from ``running_var``, a constant
    ``-1e-5`` shift that export re-bakes).
3.  Every forward tensor transform is a bijective rearrangement —
    transpose for Linear, squeeze+transpose for k=1 Conv1d,
    OIHW->HWIO for Conv2d, ``(1,C,1)->(C,)`` for LayerNorm gains — so the
    inverse is selected from the (torch shape, flax shape) signature.

Template keys the forward converter intentionally skips (``bertmodel.*`` /
``clip_model.*`` frozen text encoders, BatchNorm ``num_batches_tracked``
counters) are passed through from the template unchanged.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np

from .convert import (
    _to_numpy,
    convert_autoencoder,
    convert_denoiser,
    convert_feature_extractor,
    convert_scene_model,
)

# torch 2-D tensors the forward converter stores WITHOUT transposing
# (everything else 2-D is a Linear/Conv weight stored as (I, O))
_IDENTITY_2D_KEYS = ("positional_embedding",)


def _flatten(tree, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if hasattr(v, "items"):  # dict or flax FrozenDict
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _invert(leaf: np.ndarray, tshape: tuple, key: str) -> np.ndarray:
    """Invert the forward tensor transform for torch target shape ``tshape``."""
    if key.endswith(_IDENTITY_2D_KEYS):
        return leaf.reshape(tshape)
    if len(tshape) == 3 and tshape[-1] == 1 and leaf.ndim == 2:
        return leaf.T[:, :, None]  # k=1 Conv1d: (I, O) -> (O, I, 1)
    if len(tshape) == 2 and leaf.ndim == 2:
        return leaf.T  # Linear: (I, O) -> (O, I)
    if len(tshape) == 3 and leaf.ndim == 1:
        return leaf.reshape(tshape)  # LayerNorm g: (C,) -> (1, C, 1)
    if len(tshape) == 4 and leaf.ndim == 4:
        return np.transpose(leaf, (3, 2, 0, 1))  # Conv2d: HWIO -> OIHW
    if leaf.shape == tuple(tshape):
        return leaf  # biases, norm affines, BN stats, 1-D embeddings
    raise ValueError(f"no inverse for {key}: torch {tshape} vs flax {leaf.shape}")


def _export(
    variables: Dict,
    template: Dict[str, Any],
    forward_fn: Callable[[Dict[str, np.ndarray]], Dict],
) -> Dict[str, np.ndarray]:
    keys = list(template.keys())
    tpl = {k: _to_numpy(template[k]) for k in keys}
    # tag value i+1 per key (i=0 would be ambiguous with max(var-eps, 0))
    tagged = {k: np.full(tpl[k].shape, float(i + 1), np.float32)
              for i, k in enumerate(keys)}
    tag_tree = _flatten(forward_fn(tagged))
    # Second probe with ALL values 1.0: additive residuals (the -1e-5
    # FrozenBatchNorm un-bake) read off a float32 leaf near 1.0 resolve to
    # ~6e-8, whereas at tag magnitude ~100 the same float32 leaf quantises
    # the residual to that scale's ULP (~1e-5) and corrupts the re-bake.
    ones_tree = _flatten(forward_fn(
        {k: np.ones(tpl[k].shape, np.float32) for k in keys}))
    tag_to_path: Dict[int, tuple] = {}
    for path, leaf in tag_tree.items():
        leaf = np.asarray(leaf)
        if np.ptp(leaf) != 0:  # one flax leaf must come from ONE torch key
            raise AssertionError(f"non-constant tagged leaf at {path}")
        v = float(leaf.flat[0])
        i = int(round(v))
        if i in tag_to_path:
            raise AssertionError(f"torch key #{i} mapped to two flax leaves")
        residual = float(np.asarray(ones_tree[path]).flat[0]) - 1.0
        tag_to_path[i] = (path, residual)

    user = _flatten(variables)
    out: Dict[str, np.ndarray] = {}
    for i, k in enumerate(keys):
        hit = tag_to_path.get(i + 1)
        if hit is None:
            # skipped by the forward converter (frozen text encoders,
            # num_batches_tracked) — pass the template value through
            out[k] = template[k]
            continue
        path, residual = hit
        if path not in user:
            raise KeyError(f"variables missing leaf {path} (for torch key {k!r})")
        leaf = np.asarray(user[path], np.float32)
        t = _invert(leaf, tpl[k].shape, k)
        if residual:
            # forward stored flax = g(torch) + r  =>  torch = g^-1(flax) - r
            t = (t.astype(np.float64) - residual).astype(np.float32)
        out[k] = t
    return out


def export_denoiser(params: Dict, template: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flax Unet1D params -> torch Unet1D state_dict (denoise_net.py:335-504).

    ``template``: a reference ``Unet1D(...).state_dict()`` with matching
    hyper-parameters (keys WITHOUT the ``diffusion.model.`` prefix).
    """
    return _export(params, template, convert_denoiser)


def export_scene_model(variables: Dict, template: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """SceneNetworks variables ({'params': ..., optional 'batch_stats': ...})
    -> full DiffusionSceneLayout_DDPM state_dict
    (diffusion_scene_layout_ddpm.py:14-129).  Frozen BERT/CLIP weights are
    copied from the template (this framework precomputes text embeddings
    host-side and does not train them)."""
    return _export(variables, template, convert_scene_model)


def export_autoencoder(variables: Dict, template: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flax KLAutoEncoder variables ({'params', 'batch_stats'}) -> torch
    KLAutoEncoder state_dict (foldingnet_autoencoder.py:337-390);
    ``num_batches_tracked`` counters pass through from the template."""
    return _export(variables, template, convert_autoencoder)


def export_feature_extractor(
    variables: Dict, template: Dict[str, Any], name: str = "resnet18",
    frozen_target: bool = True,
) -> Dict[str, np.ndarray]:
    """Flax room-mask extractor variables -> reference wrapper state_dict
    (feature_extractors.py:19-68).  ``frozen_target=True`` re-bakes the
    FrozenBatchNorm eps into ``running_var`` (frozen_batchnorm.py:30), the
    layout of the reference's shipped checkpoints."""
    return _export(
        variables, template,
        lambda sd: convert_feature_extractor(sd, name, frozen_source=frozen_target),
    )


def to_torch_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """numpy state_dict -> torch tensors, ready for ``load_state_dict``."""
    import torch

    return {k: (v if isinstance(v, torch.Tensor) else torch.from_numpy(np.asarray(v)))
            for k, v in sd.items()}
