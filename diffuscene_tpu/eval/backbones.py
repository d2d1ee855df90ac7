"""JAX-native InceptionV3 and VGG16 feature backbones for FID / IPR.

The reference computes paper-comparable FID with cleanfid's InceptionV3
(scripts/compute_fid_scores.py:113-116) and improved precision/recall with
torchvision VGG16 fc2 features (scripts/improved_precision_recall.py:52-59,
141-167).  torchvision is not importable in this image, so both backbones are
implemented here as pure-JAX functional forwards over a flat parameter dict
keyed by the torchvision state_dict names — a locally shipped weights file
(torch ``.pth`` state_dict or an ``.npz`` with the same keys) is the only
external requirement.

Design notes (TPU-first):
- NHWC layout throughout; conv weights stored pre-transposed to HWIO.
- BatchNorm (Inception, eps=1e-3) is folded into the conv weights at load
  time, so the forward is conv+bias+relu only — one fused XLA op per layer.
- The whole feature forward jits cleanly (static shapes: 299x299 Inception,
  224x224 VGG) and runs batched on the accelerator.

Feature taps match the reference exactly:
- InceptionV3: the 2048-d global-average "pool3" features (torchvision
  inception_v3 up to avgpool, aux head ignored).
- VGG16: ``classifier[:4]`` — fc2 pre-activation, 4096-d
  (improved_precision_recall.py:166).
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

Params = Dict[str, Dict[str, np.ndarray]]

# ---------------------------------------------------------------------------
# architecture specs: (name, in_ch, out_ch, (kh, kw), stride, (ph, pw))
# ---------------------------------------------------------------------------

ConvSpec = Tuple[str, int, int, Tuple[int, int], int, Tuple[int, int]]


def _a(prefix: str, in_ch: int, pool: int) -> List[ConvSpec]:
    """InceptionA (torchvision Mixed_5b/5c/5d)."""
    return [
        (f"{prefix}.branch1x1", in_ch, 64, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch5x5_1", in_ch, 48, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch5x5_2", 48, 64, (5, 5), 1, (2, 2)),
        (f"{prefix}.branch3x3dbl_1", in_ch, 64, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
        (f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), 1, (1, 1)),
        (f"{prefix}.branch_pool", in_ch, pool, (1, 1), 1, (0, 0)),
    ]


def _b(prefix: str, in_ch: int) -> List[ConvSpec]:
    """InceptionB (Mixed_6a)."""
    return [
        (f"{prefix}.branch3x3", in_ch, 384, (3, 3), 2, (0, 0)),
        (f"{prefix}.branch3x3dbl_1", in_ch, 64, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 64, 96, (3, 3), 1, (1, 1)),
        (f"{prefix}.branch3x3dbl_3", 96, 96, (3, 3), 2, (0, 0)),
    ]


def _c(prefix: str, in_ch: int, c7: int) -> List[ConvSpec]:
    """InceptionC (Mixed_6b..6e)."""
    return [
        (f"{prefix}.branch1x1", in_ch, 192, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7_1", in_ch, c7, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3)),
        (f"{prefix}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7dbl_1", in_ch, c7, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3)),
        (f"{prefix}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3)),
        (f"{prefix}.branch_pool", in_ch, 192, (1, 1), 1, (0, 0)),
    ]


def _d(prefix: str, in_ch: int) -> List[ConvSpec]:
    """InceptionD (Mixed_7a)."""
    return [
        (f"{prefix}.branch3x3_1", in_ch, 192, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3_2", 192, 320, (3, 3), 2, (0, 0)),
        (f"{prefix}.branch7x7x3_1", in_ch, 192, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3)),
        (f"{prefix}.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0)),
        (f"{prefix}.branch7x7x3_4", 192, 192, (3, 3), 2, (0, 0)),
    ]


def _e(prefix: str, in_ch: int) -> List[ConvSpec]:
    """InceptionE (Mixed_7b/7c)."""
    return [
        (f"{prefix}.branch1x1", in_ch, 320, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3_1", in_ch, 384, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1)),
        (f"{prefix}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0)),
        (f"{prefix}.branch3x3dbl_1", in_ch, 448, (1, 1), 1, (0, 0)),
        (f"{prefix}.branch3x3dbl_2", 448, 384, (3, 3), 1, (1, 1)),
        (f"{prefix}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1)),
        (f"{prefix}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0)),
        (f"{prefix}.branch_pool", in_ch, 192, (1, 1), 1, (0, 0)),
    ]


INCEPTION_CONVS: List[ConvSpec] = (
    [
        ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
        ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
    ]
    + _a("Mixed_5b", 192, 32) + _a("Mixed_5c", 256, 64) + _a("Mixed_5d", 288, 64)
    + _b("Mixed_6a", 288)
    + _c("Mixed_6b", 768, 128) + _c("Mixed_6c", 768, 160)
    + _c("Mixed_6d", 768, 160) + _c("Mixed_6e", 768, 192)
    + _d("Mixed_7a", 768)
    + _e("Mixed_7b", 1280) + _e("Mixed_7c", 2048)
)

# torchvision VGG16 (cfg "D"): features.<idx> conv layers + classifier fc1/fc2
VGG16_CONVS: List[ConvSpec] = [
    (f"features.{idx}", cin, cout, (3, 3), 1, (1, 1))
    for idx, cin, cout in [
        (0, 3, 64), (2, 64, 64),
        (5, 64, 128), (7, 128, 128),
        (10, 128, 256), (12, 256, 256), (14, 256, 256),
        (17, 256, 512), (19, 512, 512), (21, 512, 512),
        (24, 512, 512), (26, 512, 512), (28, 512, 512),
    ]
]
VGG16_POOL_AFTER = {"features.2", "features.7", "features.14",
                    "features.21", "features.28"}
VGG16_FCS = [("classifier.0", 25088, 4096), ("classifier.3", 4096, 4096)]

_BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm eps


# ---------------------------------------------------------------------------
# weight loading
# ---------------------------------------------------------------------------

def _fold_conv_bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Fold ``{prefix}.bn`` into ``{prefix}.conv`` -> HWIO weight + bias."""
    w = np.asarray(sd[f"{prefix}.conv.weight"], np.float32)  # (O, I, kH, kW)
    g = np.asarray(sd[f"{prefix}.bn.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bn.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.bn.running_var"], np.float32)
    scale = g / np.sqrt(var + _BN_EPS)
    w = w * scale[:, None, None, None]
    b = beta - mean * scale
    return {"w": np.transpose(w, (2, 3, 1, 0)), "b": b}  # HWIO


def _plain_conv(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return {"w": np.transpose(w, (2, 3, 1, 0)), "b": b}


def _state_dict_from_file(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch  # torch (CPU) is in the image; torchvision is not

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def load_inception_params(path: str) -> Params:
    """Load torchvision inception_v3 weights (.pth state_dict or .npz)."""
    sd = _state_dict_from_file(path)
    return {name: _fold_conv_bn(sd, name) for name, *_ in INCEPTION_CONVS}


def load_vgg16_params(path: str) -> Params:
    """Load torchvision vgg16 weights (.pth state_dict or .npz)."""
    sd = _state_dict_from_file(path)
    params = {name: _plain_conv(sd, name) for name, *_ in VGG16_CONVS}
    for name, _, _ in VGG16_FCS:
        params[name] = {
            "w": np.asarray(sd[f"{name}.weight"], np.float32).T,  # (in, out)
            "b": np.asarray(sd[f"{name}.bias"], np.float32),
        }
    return params


def random_inception_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random torchvision-format state_dict (loader/numerics tests)."""
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for name, cin, cout, (kh, kw), _, _ in INCEPTION_CONVS:
        fan_in = cin * kh * kw
        sd[f"{name}.conv.weight"] = rng.normal(
            0, 1.0 / math.sqrt(fan_in), (cout, cin, kh, kw)).astype(np.float32)
        sd[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        sd[f"{name}.bn.bias"] = rng.normal(0, 0.1, cout).astype(np.float32)
        sd[f"{name}.bn.running_mean"] = rng.normal(0, 0.1, cout).astype(np.float32)
        sd[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    return sd


def random_vgg16_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for name, cin, cout, (kh, kw), _, _ in VGG16_CONVS:
        fan_in = cin * kh * kw
        sd[f"{name}.weight"] = rng.normal(
            0, 1.0 / math.sqrt(fan_in), (cout, cin, kh, kw)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.05, cout).astype(np.float32)
    for name, fin, fout in VGG16_FCS:
        sd[f"{name}.weight"] = rng.normal(
            0, 1.0 / math.sqrt(fin), (fout, fin)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.05, fout).astype(np.float32)
    return sd


# ---------------------------------------------------------------------------
# forward passes (pure jax, NHWC)
# ---------------------------------------------------------------------------

def _conv(p, x, stride: int, pad: Tuple[int, int]):
    import jax.lax as lax
    import jax.numpy as jnp

    y = lax.conv_general_dilated(
        x, jnp.asarray(p["w"]),
        window_strides=(stride, stride),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.asarray(p["b"])


def _conv_relu(p, x, stride: int, pad: Tuple[int, int]):
    import jax.numpy as jnp

    return jnp.maximum(_conv(p, x, stride, pad), 0.0)


def _maxpool(x, k: int, stride: int, pad: int = 0):
    import jax.lax as lax
    import jax.numpy as jnp

    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def _avgpool_3x3_s1_p1(x):
    """torch F.avg_pool2d(x, 3, 1, 1) with count_include_pad=True (the
    torchvision Inception3 default)."""
    import jax.lax as lax

    s = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / 9.0


def _avgpool_3x3_s1_p1_nopad(x):
    """torch F.avg_pool2d(x, 3, 1, 1, count_include_pad=False) — the FID
    network's pooling (pytorch-fid FIDInceptionA/C/E_1; the TF-ported
    pt_inception-2015-12-05 graph excludes padding from the average)."""
    import jax.lax as lax
    import jax.numpy as jnp

    s = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = lax.reduce_window(
        ones, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / cnt


def inception_v3_pool3(params: Params, x, *, fid_pools: bool = True,
                       transform_input: bool = False):
    """(B, 299, 299, 3) float in [-1, 1] -> (B, 2048) pool3 features.

    Mirrors torchvision ``Inception3._forward`` (aux head skipped), with two
    switches selecting which published network the forward reproduces:

    - ``fid_pools=True`` (default): the canonical FID network's pooling —
      avg pools exclude padding (count_include_pad=False) in InceptionA/C
      and Mixed_7b, and Mixed_7c's pool branch is a MAX pool (pytorch-fid
      FIDInceptionA/C/E_1/E_2, matching the TF pt_inception-2015-12-05
      graph behind cleanfid / scripts/compute_fid_scores.py:113-116).
      Use this with pytorch-fid-style weights for paper-comparable FID.
    - ``fid_pools=False``: plain torchvision inception_v3 semantics
      (count_include_pad=True everywhere, avg pool in Mixed_7c).
    - ``transform_input=True``: torchvision's pretrained-ImageNet input
      re-normalization (Inception3._transform_input); the FID weights do
      not use it.
    """
    import jax.numpy as jnp

    if transform_input:
        # torchvision Inception3._transform_input: per-channel remap from
        # the [-1, 1] convention to ImageNet mean/std
        ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
        ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
        ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
        x = jnp.concatenate([ch0, ch1, ch2], axis=-1)

    avgpool = _avgpool_3x3_s1_p1_nopad if fid_pools else _avgpool_3x3_s1_p1
    # FIDInceptionE_2 (Mixed_7c) pools with MAX, not avg
    pool_7c = (lambda v: _maxpool(v, 3, 1, 1)) if fid_pools else avgpool

    def c(name, x, stride=1, pad=(0, 0)):
        return _conv_relu(params[name], x, stride, pad)

    x = c("Conv2d_1a_3x3", x, 2)
    x = c("Conv2d_2a_3x3", x)
    x = c("Conv2d_2b_3x3", x, pad=(1, 1))
    x = _maxpool(x, 3, 2)
    x = c("Conv2d_3b_1x1", x)
    x = c("Conv2d_4a_3x3", x)
    x = _maxpool(x, 3, 2)

    def block_a(prefix, x):
        b1 = c(f"{prefix}.branch1x1", x)
        b5 = c(f"{prefix}.branch5x5_2", c(f"{prefix}.branch5x5_1", x), pad=(2, 2))
        b3 = c(f"{prefix}.branch3x3dbl_3",
               c(f"{prefix}.branch3x3dbl_2",
                 c(f"{prefix}.branch3x3dbl_1", x), pad=(1, 1)), pad=(1, 1))
        bp = c(f"{prefix}.branch_pool", avgpool(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)

    x = block_a("Mixed_5b", x)
    x = block_a("Mixed_5c", x)
    x = block_a("Mixed_5d", x)

    # Mixed_6a (InceptionB)
    b3 = c("Mixed_6a.branch3x3", x, stride=2)
    bd = c("Mixed_6a.branch3x3dbl_3",
           c("Mixed_6a.branch3x3dbl_2",
             c("Mixed_6a.branch3x3dbl_1", x), pad=(1, 1)), stride=2)
    x = jnp.concatenate([b3, bd, _maxpool(x, 3, 2)], axis=-1)

    def block_c(prefix, x):
        b1 = c(f"{prefix}.branch1x1", x)
        b7 = c(f"{prefix}.branch7x7_3",
               c(f"{prefix}.branch7x7_2",
                 c(f"{prefix}.branch7x7_1", x), pad=(0, 3)), pad=(3, 0))
        bd = x
        for suffix, pad in [("1", (0, 0)), ("2", (3, 0)), ("3", (0, 3)),
                            ("4", (3, 0)), ("5", (0, 3))]:
            bd = c(f"{prefix}.branch7x7dbl_{suffix}", bd, pad=pad)
        bp = c(f"{prefix}.branch_pool", avgpool(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)

    for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = block_c(m, x)

    # Mixed_7a (InceptionD)
    b3 = c("Mixed_7a.branch3x3_2", c("Mixed_7a.branch3x3_1", x), stride=2)
    b7 = c("Mixed_7a.branch7x7x3_1", x)
    b7 = c("Mixed_7a.branch7x7x3_2", b7, pad=(0, 3))
    b7 = c("Mixed_7a.branch7x7x3_3", b7, pad=(3, 0))
    b7 = c("Mixed_7a.branch7x7x3_4", b7, stride=2)
    x = jnp.concatenate([b3, b7, _maxpool(x, 3, 2)], axis=-1)

    def block_e(prefix, x, pool):
        b1 = c(f"{prefix}.branch1x1", x)
        b3 = c(f"{prefix}.branch3x3_1", x)
        b3 = jnp.concatenate([
            c(f"{prefix}.branch3x3_2a", b3, pad=(0, 1)),
            c(f"{prefix}.branch3x3_2b", b3, pad=(1, 0)),
        ], axis=-1)
        bd = c(f"{prefix}.branch3x3dbl_2",
               c(f"{prefix}.branch3x3dbl_1", x), pad=(1, 1))
        bd = jnp.concatenate([
            c(f"{prefix}.branch3x3dbl_3a", bd, pad=(0, 1)),
            c(f"{prefix}.branch3x3dbl_3b", bd, pad=(1, 0)),
        ], axis=-1)
        bp = c(f"{prefix}.branch_pool", pool(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)

    x = block_e("Mixed_7b", x, avgpool)
    x = block_e("Mixed_7c", x, pool_7c)
    return x.mean(axis=(1, 2))  # adaptive avgpool -> (B, 2048)


def vgg16_fc2(params: Params, x):
    """(B, 224, 224, 3) ImageNet-normalized -> (B, 4096) fc2 features.

    Matches improved_precision_recall.py:164-166:
    ``vgg16.classifier[:4](vgg16.features(x).view(-1, 25088))`` — fc2
    pre-activation (dropout is identity in eval).
    """
    import jax.numpy as jnp

    for name, *_ in VGG16_CONVS:
        x = _conv_relu(params[name], x, 1, (1, 1))
        if name in VGG16_POOL_AFTER:
            x = _maxpool(x, 2, 2)
    # torch flattens NCHW (C, H, W) order; x is NHWC -> transpose first
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)  # (B, 25088)
    x = jnp.maximum(x @ jnp.asarray(params["classifier.0"]["w"])
                    + jnp.asarray(params["classifier.0"]["b"]), 0.0)
    return x @ jnp.asarray(params["classifier.3"]["w"]) + jnp.asarray(
        params["classifier.3"]["b"])
