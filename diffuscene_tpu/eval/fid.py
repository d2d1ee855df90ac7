"""FID / KID over rendered scene images, with pluggable feature extractors.

Equivalent of `scripts/compute_fid_scores.py` (which calls cleanfid's
`compute_fid`/`compute_kid` over two render folders, lines 113-116).  cleanfid
is not available in this image and InceptionV3 weights cannot be downloaded in
an air-gapped environment, so the metric math lives here and the feature
extractor is injected:

- `InceptionFeatures` — torchvision/cleanfid-compatible InceptionV3 pool3
  features when local weights exist (paper-comparable numbers).
- `PixelFeatures` — normalized downsampled grayscale pixels; deterministic
  and dependency-free.  Useful for relative comparisons and tests; NOT
  comparable to published FID values (documented loudly on purpose).

FID: Frechet distance between feature Gaussians (Heusel et al. 2017).
KID: unbiased block MMD^2 with the cubic polynomial kernel
     k(x, y) = (x.y / d + 1)^3 (Binkowski et al. 2018) — the same estimator
     cleanfid uses (subset_size-sized blocks, averaged).
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

FeatureFn = Callable[[np.ndarray], np.ndarray]  # (B, H, W, C) uint8 -> (B, D)


# ---------------------------------------------------------------------------
# metric math
# ---------------------------------------------------------------------------

def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians N(mu1, sigma1), N(mu2, sigma2)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_features(feats1: np.ndarray, feats2: np.ndarray) -> float:
    mu1, sigma1 = feats1.mean(0), np.cov(feats1, rowvar=False)
    mu2, sigma2 = feats2.mean(0), np.cov(feats2, rowvar=False)
    return frechet_distance(mu1, sigma1, mu2, sigma2)


def _poly_kernel(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    d = x.shape[1]
    return (x @ y.T / d + 1.0) ** 3


def _mmd2_unbiased(x: np.ndarray, y: np.ndarray) -> float:
    m = x.shape[0]
    kxx = _poly_kernel(x, x)
    kyy = _poly_kernel(y, y)
    kxy = _poly_kernel(x, y)
    np.fill_diagonal(kxx, 0.0)
    np.fill_diagonal(kyy, 0.0)
    return float(
        kxx.sum() / (m * (m - 1)) + kyy.sum() / (m * (m - 1)) - 2.0 * kxy.mean()
    )


def kid_from_features(
    feats1: np.ndarray, feats2: np.ndarray,
    subset_size: int = 1000, n_subsets: int = 100, seed: int = 0,
) -> float:
    """Averaged block unbiased MMD^2 (the cleanfid KID estimator)."""
    rng = np.random.default_rng(seed)
    n = min(feats1.shape[0], feats2.shape[0], subset_size)
    vals = []
    for _ in range(n_subsets):
        i1 = rng.choice(feats1.shape[0], n, replace=False)
        i2 = rng.choice(feats2.shape[0], n, replace=False)
        vals.append(_mmd2_unbiased(feats1[i1], feats2[i2]))
    return float(np.mean(vals))


# ---------------------------------------------------------------------------
# feature extractors
# ---------------------------------------------------------------------------

class PixelFeatures:
    """Grayscale, bilinear-resized, flattened pixel features (offline-safe).

    NOT comparable to Inception-based FID numbers; use for relative
    comparisons (e.g. tracking training progress) and tests only.
    """

    def __init__(self, size: int = 32):
        self.size = size

    def __call__(self, images: np.ndarray) -> np.ndarray:
        from PIL import Image

        out = []
        for img in images:
            im = Image.fromarray(img.astype(np.uint8)).convert("L").resize(
                (self.size, self.size), Image.BILINEAR
            )
            out.append(np.asarray(im, np.float32).reshape(-1) / 255.0)
        return np.stack(out)


class InceptionFeatures:
    """InceptionV3 pool3 features via torch (requires local weights).

    ``weights_path`` must point to a torchvision-format inception_v3
    state_dict; in air-gapped environments ship it alongside the data.
    """

    def __init__(self, weights_path: Optional[str] = None, batch_size: int = 32):
        import torch
        from torch import nn

        try:
            from torchvision.models import inception_v3
        except ImportError as e:  # pragma: no cover - torchvision optional
            raise ImportError(
                "InceptionFeatures needs torchvision; use PixelFeatures or "
                "ship a feature extractor"
            ) from e
        self.torch = torch
        model = inception_v3(weights=None, aux_logits=True, init_weights=False)
        if weights_path:
            model.load_state_dict(torch.load(weights_path, map_location="cpu"))
        model.fc = nn.Identity()
        model.eval()
        self.model = model
        self.batch_size = batch_size

    def __call__(self, images: np.ndarray) -> np.ndarray:
        torch = self.torch
        feats = []
        with torch.no_grad():
            for i in range(0, len(images), self.batch_size):
                chunk = images[i : i + self.batch_size].astype(np.float32) / 255.0
                x = torch.from_numpy(chunk).permute(0, 3, 1, 2)
                x = torch.nn.functional.interpolate(
                    x, size=(299, 299), mode="bilinear", align_corners=False
                )
                x = (x - 0.5) / 0.5
                feats.append(self.model(x).numpy())
        return np.concatenate(feats)


class _JaxBatchedFeatures:
    """Shared lazy-jit + fixed-batch pad/chunk loop for the JAX backbones.

    Subclasses set ``self.params`` and implement ``_forward(params, x)``
    over (B, H, W, 3) float images in [0, 1].  Params are passed as a jit
    ARGUMENT (device arrays), not closure constants — closing over them
    bakes hundreds of MB of weights into the HLO as literals, which
    explodes compile time.  Short chunks are zero-padded to the compiled
    batch shape so one executable serves every call.
    """

    params: dict
    batch_size: int

    def _forward(self, params, x):  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, images: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        if getattr(self, "_jit", None) is None:
            self._dev_params = jax.device_put(
                jax.tree.map(jnp.asarray, self.params))
            self._jit = jax.jit(self._forward)
        feats = []
        bs = self.batch_size
        for i in range(0, len(images), bs):
            chunk = images[i : i + bs].astype(np.float32) / 255.0
            if len(chunk) < bs:  # pad to the compiled batch shape
                pad = np.zeros((bs - len(chunk),) + chunk.shape[1:], np.float32)
                out = self._jit(self._dev_params, jnp.asarray(np.concatenate([chunk, pad])))
                feats.append(np.asarray(out)[: len(chunk)])
            else:
                feats.append(np.asarray(self._jit(self._dev_params, jnp.asarray(chunk))))
        return np.concatenate(feats)


class JaxInceptionFeatures(_JaxBatchedFeatures):
    """InceptionV3 pool3 features via the pure-JAX backbone (no torchvision).

    ``weights_path`` points to an inception_v3 state_dict with torchvision
    key layout (torch ``.pth`` or ``.npz`` with the same keys) — see
    ``eval/backbones``.  Preprocessing matches the FID standard: bilinear
    resize to 299x299 of the [0,1] image, then scale to [-1,1]
    (compute_fid_scores.py:113-116 path).

    ``fid_pools=True`` (default) reproduces the canonical FID network's
    pooling (pytorch-fid FIDInception*, i.e. the TF pt_inception graph:
    padding-excluded avg pools + max pool in Mixed_7c) — use it with
    FID-network weights for paper-comparable numbers.  Set
    ``fid_pools=False, transform_input=True`` for plain torchvision
    ImageNet inception_v3 weights.
    """

    def __init__(self, weights_path: str, batch_size: int = 64,
                 fid_pools: bool = True, transform_input: bool = False):
        from .backbones import inception_v3_pool3, load_inception_params

        if not weights_path or not os.path.isfile(weights_path):
            raise FileNotFoundError(
                f"InceptionV3 weights not found at {weights_path!r}: FID with "
                "--features inception needs a locally shipped "
                "inception_v3 state_dict (.pth) or .npz; refusing to fall "
                "back to pixel features silently")
        self.params = load_inception_params(weights_path)
        self._fn = inception_v3_pool3
        self.batch_size = batch_size
        self.fid_pools = fid_pools
        self.transform_input = transform_input

    def _forward(self, params, x):
        import jax

        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        return self._fn(params, x * 2.0 - 1.0, fid_pools=self.fid_pools,
                        transform_input=self.transform_input)


class JaxVGG16Features(_JaxBatchedFeatures):
    """VGG16 fc2 features via the pure-JAX backbone (no torchvision).

    Matches the reference IPR pipeline (improved_precision_recall.py:319-325,
    141-167): resize to 224, ImageNet mean/std normalize, fc2 pre-activation.
    """

    _MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    _STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(self, weights_path: str, batch_size: int = 64):
        from .backbones import load_vgg16_params, vgg16_fc2

        if not weights_path or not os.path.isfile(weights_path):
            raise FileNotFoundError(
                f"VGG16 weights not found at {weights_path!r}: IPR with "
                "--features vgg needs a locally shipped torchvision vgg16 "
                "state_dict (.pth) or .npz")
        self.params = load_vgg16_params(weights_path)
        self._fn = vgg16_fc2
        self.batch_size = batch_size

    def _forward(self, params, x):
        import jax
        import jax.numpy as jnp

        x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "bilinear")
        return self._fn(params, (x - jnp.asarray(self._MEAN)) / jnp.asarray(self._STD))


def load_image_paths(paths) -> np.ndarray:
    """Load an explicit list of image files into (B, H, W, 3) uint8."""
    from PIL import Image

    return np.stack([np.asarray(Image.open(f).convert("RGB")) for f in paths])


def load_image_folder(path: str, limit: Optional[int] = None) -> np.ndarray:
    """Load a folder of renders into (B, H, W, 3) uint8 (sorted order)."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if limit:
        files = files[:limit]
    return load_image_paths(files)


def compute_fid_folders(real_dir: str, fake_dir: str,
                        feature_fn: Optional[FeatureFn] = None) -> float:
    """compute_fid_scores.py:113 equivalent over two render folders."""
    feature_fn = feature_fn or PixelFeatures()
    return fid_from_features(
        feature_fn(load_image_folder(real_dir)), feature_fn(load_image_folder(fake_dir))
    )


def compute_kid_folders(real_dir: str, fake_dir: str,
                        feature_fn: Optional[FeatureFn] = None,
                        subset_size: int = 1000) -> float:
    feature_fn = feature_fn or PixelFeatures()
    return kid_from_features(
        feature_fn(load_image_folder(real_dir)),
        feature_fn(load_image_folder(fake_dir)),
        subset_size=subset_size,
    )
