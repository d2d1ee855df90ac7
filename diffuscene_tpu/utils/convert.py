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


_FBN_EPS = 1e-5  # models/feature_extractors.py FrozenBatchNorm forward eps


def convert_feature_extractor(state_dict: Dict[str, Any], name: str = "resnet18",
                              frozen_source: bool = True) -> Dict:
    """Reference room-mask extractor state_dict -> flax variables.

    Maps the reference ``ResNet18``/``AlexNet`` wrappers
    (feature_extractors.py:19-68; torchvision backbones with a 1-channel
    stem and custom FC heads) onto ``models/feature_extractors.py``.  Keys
    may carry the ``feature_extractor.`` prefix of a full scene checkpoint.

    ``frozen_source=True`` (reference checkpoints): FrozenBatchNorm2d.freeze
    baked ``bn.eps`` into ``running_var`` (frozen_batchnorm.py:30) and the
    frozen forward applies NO eps; our forward adds ``1e-5``, so the baked
    eps is subtracted here — the composed affine is then bit-identical.
    Pass ``frozen_source=False`` for a plain (unfrozen) torchvision
    state_dict, whose running_var has no eps baked in.

    Returns ``{"params": ..., "batch_stats": ...}`` (AlexNet has no stats).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k[len("feature_extractor."):] if k.startswith("feature_extractor.") else k
        sd[k] = _to_numpy(v)

    params: Dict = {}
    stats: Dict = {}

    def conv(dst, key, bias=False):
        w = sd[f"{key}.weight"]  # (O, I, kH, kW)
        _set(params, (dst, "kernel"), np.transpose(w, (2, 3, 1, 0)))
        if bias:
            _set(params, (dst, "bias"), sd[f"{key}.bias"])

    def bn(dst, key):
        _set(params, (dst, "scale"), sd[f"{key}.weight"])
        _set(params, (dst, "bias"), sd[f"{key}.bias"])
        _set(stats, (dst, "mean"), sd[f"{key}.running_mean"])
        var = sd[f"{key}.running_var"].astype(np.float64)
        if frozen_source:
            var = var - _FBN_EPS  # un-bake the freeze-time eps
        _set(stats, (dst, "var"), np.maximum(var, 0.0).astype(np.float32))

    def linear(dst, key):
        _set(params, (dst, "kernel"), sd[f"{key}.weight"].T)
        _set(params, (dst, "bias"), sd[f"{key}.bias"])

    if name == "resnet18":
        fe = "_feature_extractor"
        conv("conv1", f"{fe}.conv1")
        bn("bn1", f"{fe}.bn1")
        for layer in range(1, 5):
            for blk in range(2):
                dst = f"layer{layer}_{blk}"
                base = f"{fe}.layer{layer}.{blk}"
                for c in ("conv1", "conv2"):
                    w = sd[f"{base}.{c}.weight"]
                    _set(params, (dst, c, "kernel"), np.transpose(w, (2, 3, 1, 0)))
                for b in ("bn1", "bn2"):
                    _set(params, (dst, b, "scale"), sd[f"{base}.{b}.weight"])
                    _set(params, (dst, b, "bias"), sd[f"{base}.{b}.bias"])
                    _set(stats, (dst, b, "mean"), sd[f"{base}.{b}.running_mean"])
                    var = sd[f"{base}.{b}.running_var"].astype(np.float64)
                    if frozen_source:
                        var = var - _FBN_EPS
                    _set(stats, (dst, b, "var"), np.maximum(var, 0.0).astype(np.float32))
                if f"{base}.downsample.0.weight" in sd:
                    w = sd[f"{base}.downsample.0.weight"]
                    _set(params, (dst, "downsample_conv", "kernel"),
                         np.transpose(w, (2, 3, 1, 0)))
                    _set(params, (dst, "downsample_bn", "scale"),
                         sd[f"{base}.downsample.1.weight"])
                    _set(params, (dst, "downsample_bn", "bias"),
                         sd[f"{base}.downsample.1.bias"])
                    _set(stats, (dst, "downsample_bn", "mean"),
                         sd[f"{base}.downsample.1.running_mean"])
                    var = sd[f"{base}.downsample.1.running_var"].astype(np.float64)
                    if frozen_source:
                        var = var - _FBN_EPS
                    _set(stats, (dst, "downsample_bn", "var"),
                         np.maximum(var, 0.0).astype(np.float32))
        linear("fc_0", f"{fe}.fc.0")
        linear("fc_2", f"{fe}.fc.2")
        return {"params": params, "batch_stats": stats}

    if name == "alexnet":
        fe = "_feature_extractor"
        for i, idx in enumerate((0, 3, 6, 8, 10)):
            conv(f"conv{i + 1}", f"{fe}.features.{idx}", bias=True)
        linear("fc", "_fc")
        return {"params": params}

    raise NotImplementedError(name)


def convert_scene_model(state_dict: Dict[str, Any]) -> Dict:
    """Full DiffusionSceneLayout_DDPM state_dict -> SceneNetworks variables.

    Returns {'params': {'denoiser': ..., 'conditioner': ...}} — plus
    'feature_extractor' params and 'batch_stats' when the checkpoint carries
    room-mask extractor weights (converted via convert_feature_extractor;
    ResNet18 assumed, the reference's shipped default).  BERT/CLIP weights
    (frozen text encoders) are intentionally skipped: text embeddings are
    precomputed host-side in this framework.
    """
    denoiser_sd = {}
    cond: Dict = {}
    fe_sd: Dict = {}
    for key, val in state_dict.items():
        if key.startswith("diffusion.model."):
            denoiser_sd[key[len("diffusion.model."):]] = val
            continue
        if key.startswith("feature_extractor."):
            fe_sd[key] = val
            continue
        if key.startswith(("bertmodel.", "clip_model.")):
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
    out = {"params": {"denoiser": convert_denoiser(denoiser_sd), "conditioner": cond}}
    if fe_sd:
        name = "alexnet" if any("_fc." in k or "features." in k for k in fe_sd) else "resnet18"
        fe = convert_feature_extractor(fe_sd, name)
        out["params"]["feature_extractor"] = fe["params"]
        if "batch_stats" in fe:
            out["batch_stats"] = {"feature_extractor": fe["batch_stats"]}
    return out


def convert_autoencoder(state_dict: Dict[str, Any]) -> Dict:
    """Reference KLAutoEncoder state_dict -> flax variables for
    ``models/autoencoder.KLAutoEncoder``.

    Source layout (`foldingnet_autoencoder.py:337-390`):
    - ``encoder.conv{1..4}`` k=1 Conv1d + ``encoder.bn{1..4}`` BatchNorm1d
      (:161-207); ``encoder.graph_layer{1,2}.{conv,bn}`` (:131-160)
    - ``mean_fc`` / ``logvar_fc`` / ``fc`` Linear (:343-347)
    - ``decoder.fold{1,2}.layers`` Sequential [Conv1d, BN, ReLU, Conv1d, BN,
      ReLU, Conv1d] -> indices 0/1/3/4/6 (:210-241)

    Tensor rules: Conv1d (O, I, 1) -> Dense kernel (I, O); Linear (O, I) ->
    (I, O); BatchNorm weight/bias -> params scale/bias, running_mean/var ->
    batch_stats mean/var (same eps=1e-5 on both sides, nothing baked).

    Returns ``{"params": ..., "batch_stats": ...}``.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}

    params: Dict = {}
    stats: Dict = {}

    def conv1d(dst, key):
        _set(params, (*dst, "kernel"), sd[f"{key}.weight"][:, :, 0].T)
        _set(params, (*dst, "bias"), sd[f"{key}.bias"])

    def linear(dst, key):
        _set(params, (*dst, "kernel"), sd[f"{key}.weight"].T)
        _set(params, (*dst, "bias"), sd[f"{key}.bias"])

    def bn(dst, key):
        _set(params, (*dst, "scale"), sd[f"{key}.weight"])
        _set(params, (*dst, "bias"), sd[f"{key}.bias"])
        _set(stats, (*dst, "mean"), sd[f"{key}.running_mean"])
        _set(stats, (*dst, "var"), sd[f"{key}.running_var"])

    for i in range(1, 5):
        conv1d(("encoder", f"conv{i}"), f"encoder.conv{i}")
        bn(("encoder", f"bn{i}"), f"encoder.bn{i}")
    for g in (1, 2):
        conv1d(("encoder", f"graph_layer{g}", "conv"), f"encoder.graph_layer{g}.conv")
        bn(("encoder", f"graph_layer{g}", "bn"), f"encoder.graph_layer{g}.bn")
    linear(("mean_fc",), "mean_fc")
    linear(("logvar_fc",), "logvar_fc")
    linear(("fc",), "fc")
    for f in (1, 2):
        # Sequential indices: 0=conv, 1=bn, 3=conv, 4=bn, 6=out conv
        conv1d(("decoder", f"fold{f}", "conv0"), f"decoder.fold{f}.layers.0")
        bn(("decoder", f"fold{f}", "bn0"), f"decoder.fold{f}.layers.1")
        conv1d(("decoder", f"fold{f}", "conv1"), f"decoder.fold{f}.layers.3")
        bn(("decoder", f"fold{f}", "bn1"), f"decoder.fold{f}.layers.4")
        conv1d(("decoder", f"fold{f}", "out"), f"decoder.fold{f}.layers.6")
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch .pt state_dict on CPU (weights only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return dict(sd)
