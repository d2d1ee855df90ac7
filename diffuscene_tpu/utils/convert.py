"""PyTorch checkpoint -> Flax params converter.

Converts the reference's published `.pt` state_dicts
(DiffusionSceneLayout_DDPM, `diffusion_scene_layout_ddpm.py:14-129`; Unet1D,
`denoise_net.py:335-504`) into the params pytree of this framework's
`SceneNetworks` ({'denoiser': Unet1D, 'conditioner': ConditionNets}).

Key layout facts (verified against a live reference state_dict):
- denoiser keys live under ``diffusion.model.`` (DiffusionPoint holds the
  net as ``self.model``, diffusion_ddpm.py:731)
- each down/up level is a 6-slot ModuleList [block0, block1, attncross,
  block2, attn, down/upsample]; slots 2 and 5 are parameterless Identity
  except cross-attn (text models) and the last level's k=1 Conv1d
- attention wrappers: Residual(PreNorm(fn)) -> ``X.fn.norm.g`` (pre-norm) and
  ``X.fn.fn.*`` (the attention); LinearAttention's to_out is
  Sequential(Conv1d, LayerNorm) -> ``to_out.0`` / ``to_out.1.g``
- per-attribute encoder/decoder MLPs are Sequential(Conv1d, GELU, Conv1d,
  GELU, Conv1d) -> indices 0/2/4

Tensor conversions: Conv1d (O, I, 1) -> Dense kernel (I, O); Linear (O, I)
-> (I, O); GroupNorm weight/bias -> scale/bias; LayerNorm g (1, C, 1) -> (C,).
"""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _set(tree: Dict, path, leaf: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


_SLOT_NAMES = {0: "block0", 1: "block1", 2: "attncross", 3: "block2", 4: "attn", 5: "proj"}


def _convert_resblock(rest: str, w: np.ndarray):
    """Map ResnetBlock-internal torch key -> (flax subpath, tensor)."""
    if rest.startswith("mlp.1."):
        kind = rest.split(".")[-1]
        return (("mlp", "kernel"), w.T) if kind == "weight" else (("mlp", "bias"), w)
    m = re.match(r"(block[12])\.(proj|norm)\.(weight|bias)$", rest)
    if m:
        blk, sub, kind = m.groups()
        if sub == "proj":
            return ((blk, "proj", "kernel"), w[:, :, 0].T) if kind == "weight" else ((blk, "proj", "bias"), w)
        name = "scale" if kind == "weight" else "bias"
        return ((blk, "norm", name), w)
    m = re.match(r"res_conv\.(weight|bias)$", rest)
    if m:
        kind = m.group(1)
        return (("res_conv", "kernel"), w[:, :, 0].T) if kind == "weight" else (("res_conv", "bias"), w)
    raise KeyError(rest)


def _convert_attn(base: str, rest: str, w: np.ndarray, cross: bool):
    """Residual(PreNorm(Attention-like)) keys -> flax paths.

    ``base`` is the flax module name (e.g. 'down0_attn'); the paired pre-norm
    module is ``{base}_norm``.
    """
    if rest == "fn.norm.g":
        return ((f"{base}_norm", "g"), w.reshape(-1))
    m = re.match(r"fn\.fn\.(to_qkv|to_q|to_kv)\.weight$", rest)
    if m:
        return ((base, m.group(1), "kernel"), w[:, :, 0].T)
    m = re.match(r"fn\.fn\.to_out\.0\.(weight|bias)$", rest)
    if m:  # LinearAttention: Sequential(Conv1d, LayerNorm)
        kind = m.group(1)
        return ((base, "to_out", "kernel"), w[:, :, 0].T) if kind == "weight" else ((base, "to_out", "bias"), w)
    if rest == "fn.fn.to_out.1.g":
        return ((base, "out_norm", "g"), w.reshape(-1))
    m = re.match(r"fn\.fn\.to_out\.(weight|bias)$", rest)
    if m:  # full Attention: plain Conv1d
        kind = m.group(1)
        return ((base, "to_out", "kernel"), w[:, :, 0].T) if kind == "weight" else ((base, "to_out", "bias"), w)
    raise KeyError(f"{base}: {rest}")


def _convert_mlp_enc_dec(base: str, rest: str, w: np.ndarray):
    """Sequential(Conv1d, GELU, Conv1d, GELU, Conv1d) -> fc0/fc1/fc2."""
    m = re.match(r"([024])\.(weight|bias)$", rest)
    if not m:
        raise KeyError(f"{base}: {rest}")
    idx, kind = int(m.group(1)), m.group(2)
    fc = f"fc{idx // 2}"
    return ((base, fc, "kernel"), w[:, :, 0].T) if kind == "weight" else ((base, fc, "bias"), w)


def convert_denoiser(state_dict: Dict[str, Any]) -> Dict:
    """Torch Unet1D state_dict (keys WITHOUT the 'diffusion.model.' prefix)
    -> flax Unet1D params dict."""
    out: Dict = {}
    for key, val in state_dict.items():
        w = _to_numpy(val)
        # per-attribute encoder/decoder MLPs
        m = re.match(r"(bbox|class|objectness|objfeat)_(embedf|hidden2output)\.(.*)$", key)
        if m:
            base = f"{m.group(1)}_{m.group(2)}"
            path, t = _convert_mlp_enc_dec(base, m.group(3), w)
            _set(out, path, t)
            continue
        m = re.match(r"init_conv\.(weight|bias)$", key)
        if m:
            kind = m.group(1)
            _set(out, ("init_conv", "kernel") if kind == "weight" else ("init_conv", "bias"),
                 w[:, :, 0].T if kind == "weight" else w)
            continue
        m = re.match(r"final_conv\.(weight|bias)$", key)
        if m:
            kind = m.group(1)
            _set(out, ("final_conv", "kernel") if kind == "weight" else ("final_conv", "bias"),
                 w[:, :, 0].T if kind == "weight" else w)
            continue
        m = re.match(r"time_mlp\.([13])\.(weight|bias)$", key)
        if m:
            name = "time_mlp_1" if m.group(1) == "1" else "time_mlp_2"
            kind = m.group(2)
            _set(out, (name, "kernel") if kind == "weight" else (name, "bias"),
                 w.T if kind == "weight" else w)
            continue
        m = re.match(r"sinu_pos_emb\.weights$", key)
        if m:
            _set(out, ("sinu_pos_emb", "weights"), w)
            continue
        m = re.match(r"(downs|ups)\.(\d+)\.(\d+)\.(.*)$", key)
        if m:
            stack, lvl, slot, rest = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
            prefix = "down" if stack == "downs" else "up"
            name = f"{prefix}{lvl}_{_SLOT_NAMES[int(slot)]}"
            if _SLOT_NAMES[int(slot)] in ("block0", "block1", "block2"):
                sub, t = _convert_resblock(rest, w)
                _set(out, (name, *sub), t)
            elif _SLOT_NAMES[int(slot)] == "proj":
                kind = rest
                _set(out, (name, "kernel") if kind == "weight" else (name, "bias"),
                     w[:, :, 0].T if kind == "weight" else w)
            else:  # attn / attncross
                path, t = _convert_attn(name, rest, w, cross=_SLOT_NAMES[int(slot)] == "attncross")
                _set(out, path, t)
            continue
        m = re.match(r"mid_(block[012])\.(.*)$", key)
        if m:
            sub, t = _convert_resblock(m.group(2), w)
            _set(out, (f"mid_{m.group(1)}", *sub), t)
            continue
        m = re.match(r"mid_attn_cross\.(.*)$", key)
        if m:
            path, t = _convert_attn("mid_attncross", m.group(1), w, cross=True)
            _set(out, path, t)
            continue
        m = re.match(r"mid_attn\.(.*)$", key)
        if m:
            path, t = _convert_attn("mid_attn", m.group(1), w, cross=False)
            _set(out, path, t)
            continue
        m = re.match(r"final_res_block\.(.*)$", key)
        if m:
            sub, t = _convert_resblock(m.group(1), w)
            _set(out, ("final_res_block", *sub), t)
            continue
        raise KeyError(f"unmapped denoiser key: {key}")
    return out


_COND_LINEAR = {
    "fc_room_f": ("fc_room_f",),
    "fc_text_f": ("fc_text_f",),
    "fc_instance_condition.0": ("fc_instance_0",),
    "fc_instance_condition.2": ("fc_instance_1",),
    "fc_partial_condition.0": ("fc_partial_0",),
    "fc_partial_condition.2": ("fc_partial_1",),
    "fc_arrange_condition.0": ("fc_arrange_0",),
    "fc_arrange_condition.2": ("fc_arrange_1",),
}


def convert_scene_model(state_dict: Dict[str, Any]) -> Dict:
    """Full DiffusionSceneLayout_DDPM state_dict -> SceneNetworks params.

    Returns {'params': {'denoiser': ..., 'conditioner': ...}}.  BERT/CLIP
    weights (frozen text encoders) and the room feature extractor are
    intentionally skipped: text embeddings are precomputed host-side in this
    framework, and the extractor (if enabled) converts separately.
    """
    denoiser_sd = {}
    cond: Dict = {}
    for key, val in state_dict.items():
        if key.startswith("diffusion.model."):
            denoiser_sd[key[len("diffusion.model."):]] = val
            continue
        if key.startswith(("bertmodel.", "clip_model.", "feature_extractor.")):
            continue
        if key == "positional_embedding":
            _set(cond, ("positional_embedding",), _to_numpy(val))
            continue
        m = re.match(r"(.+)\.(weight|bias)$", key)
        if m and m.group(1) in _COND_LINEAR:
            base = _COND_LINEAR[m.group(1)]
            w = _to_numpy(val)
            kind = m.group(2)
            _set(cond, (*base, "kernel") if kind == "weight" else (*base, "bias"),
                 w.T if kind == "weight" else w)
            continue
        raise KeyError(f"unmapped scene-model key: {key}")
    return {"params": {"denoiser": convert_denoiser(denoiser_sd), "conditioner": cond}}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch .pt state_dict on CPU (weights only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return dict(sd)
