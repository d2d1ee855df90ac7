"""KL-regularized point-cloud shape autoencoder (graph encoder + FoldingNet).

TPU-native re-design of the reference KLAutoEncoder
(`scene_synthesis/networks/foldingnet_autoencoder.py:131-420`), which produces
the 32-d latent "objfeats" codes consumed by the scene diffusion model.

Layout notes (vs the reference's (B, C, N) conv layout): everything here is
(B, N, C) with `nn.Dense` — each k=1 Conv1d is one large MXU matmul over the
flattened (B*N) rows.  The KNN graph ops come from `ops/knn.py` (pairwise
matmul + top_k); the training loss uses the Pallas chamfer kernel from
`ops/chamfer.py` instead of the reference's CUDA extension.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.chamfer import chamfer_distance
from ..ops.knn import gather_neighbors, knn_indices


class GraphLayer(nn.Module):
    """KNN local max-pool + Dense + BN + ReLU.

    (foldingnet_autoencoder.py:131-160).  KNN is computed in feature space.
    """

    out_channel: int
    k: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        idx = knn_indices(x, self.k)  # (B, N, k)
        neigh = gather_neighbors(x, idx)  # (B, N, k, C)
        x = jnp.max(neigh, axis=2)  # local max pooling
        x = nn.Dense(self.out_channel, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(x)
        return nn.relu(x)


class Encoder(nn.Module):
    """Graph-based encoder: KNN covariances -> MLPs -> 2 graph layers -> max.

    (foldingnet_autoencoder.py:161-207).  Input (B, N, 3), output (B, 512).
    """

    k: int = 16

    @nn.compact
    def __call__(self, pc: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, N, _ = pc.shape
        # local covariance features (B, N, 9)
        idx = knn_indices(pc, self.k)
        neigh = gather_neighbors(pc, idx)  # (B, N, k, 3)
        centered = neigh - jnp.mean(neigh, axis=2, keepdims=True)
        cov = jnp.einsum("bnki,bnkj->bnij", centered, centered).reshape(B, N, 9)
        x = jnp.concatenate([pc, cov], axis=-1)  # (B, N, 12)

        for i in (1, 2, 3):
            x = nn.Dense(64, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}")(x)
            x = nn.relu(x)

        x = GraphLayer(128, k=self.k, name="graph_layer1")(x, train)
        x = GraphLayer(1024, k=self.k, name="graph_layer2")(x, train)

        x = nn.Dense(512, name="conv4")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn4")(x)
        return jnp.max(x, axis=1)  # global max pool -> (B, 512)


class FoldingLayer(nn.Module):
    """Shared MLP over concatenated (grid/points, codewords).

    (foldingnet_autoencoder.py:210-241).
    """

    out_channels: Tuple[int, ...] = (512, 512, 3)

    @nn.compact
    def __call__(self, grids: jnp.ndarray, codewords: jnp.ndarray, train: bool = False):
        x = jnp.concatenate([grids, codewords], axis=-1)
        for i, oc in enumerate(self.out_channels[:-1]):
            x = nn.Dense(oc, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_channels[-1], name="out")(x)


def folding_grid(grid_size: int = 45, extent: float = 0.3) -> np.ndarray:
    """2D folding seed grid, (grid_size^2, 2).  (foldingnet_autoencoder.py:252-258)"""
    xx = np.linspace(-extent, extent, grid_size, dtype=np.float32)
    yy = np.linspace(-extent, extent, grid_size, dtype=np.float32)
    g = np.meshgrid(xx, yy)  # matches torch view(2, -1) ordering
    return np.stack([g[0].reshape(-1), g[1].reshape(-1)], axis=-1)


class Decoder(nn.Module):
    """FoldingNet 2-fold decoder over a 45x45 grid -> 2025 points.

    (foldingnet_autoencoder.py:244-282).  Input (B, 512) codewords, output
    (B, 2025, 3).
    """

    grid_size: int = 45

    @nn.compact
    def __call__(self, code: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = code.shape[0]
        grid = jnp.asarray(folding_grid(self.grid_size))  # (M, 2)
        m = grid.shape[0]
        grid = jnp.broadcast_to(grid[None], (B, m, 2))
        code = jnp.broadcast_to(code[:, None, :], (B, m, code.shape[-1]))
        recon1 = FoldingLayer((512, 512, 3), name="fold1")(grid, code, train)
        recon2 = FoldingLayer((512, 512, 3), name="fold2")(recon1, code, train)
        return recon2


class AutoEncoder(nn.Module):
    """Plain (non-KL) encoder/decoder pair.  (foldingnet_autoencoder.py:285-295)"""

    @nn.compact
    def __call__(self, pc: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        code = Encoder(name="encoder")(pc, train)
        return Decoder(name="decoder")(code, train)


def diagonal_gaussian_kl(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mean, var) || N(0, I)), mean over latent dim -> (B,).

    (foldingnet_autoencoder.py:297-321; note the reference takes the *mean*
    over the latent dimension, not the sum.)
    """
    logvar = jnp.clip(logvar, -30.0, 20.0)
    var = jnp.exp(logvar)
    return 0.5 * jnp.mean(mean**2 + var - 1.0 - logvar, axis=1)


class KLAutoEncoder(nn.Module):
    """KL-regularized shape AE producing the latent objfeats.

    (foldingnet_autoencoder.py:337-390).  ``latent_dim=32`` with
    ``kl_weight=0.001`` in the shipped configs
    (config/obj_autoencoder/bed_living_diningrooms_lat32.yaml:34-58).
    """

    latent_dim: int = 64
    kl_weight: float = 0.001

    def setup(self):
        self.encoder = Encoder()
        self.mean_fc = nn.Dense(self.latent_dim)
        self.logvar_fc = nn.Dense(self.latent_dim)
        self.fc = nn.Dense(512)
        self.decoder = Decoder()

    def posterior(self, pc: jnp.ndarray, train: bool = False):
        """(B, N, 3) -> (mean, clipped logvar) of the latent posterior.

        Exposed separately so callers (tests, noise-injected parity chains)
        can sample with their own eps: lat = mean + exp(0.5*logvar) * eps —
        the exact DiagonalGaussianDistribution.sample() form
        (foldingnet_autoencoder.py:297-310).
        """
        h = self.encoder(pc, train)
        mean = self.mean_fc(h)
        logvar = jnp.clip(self.logvar_fc(h), -30.0, 20.0)
        return mean, logvar

    def encode(self, pc: jnp.ndarray, train: bool = False, deterministic: bool = False):
        """(B, N, 3) -> (kl (B,), latent (B, latent_dim))."""
        mean, logvar = self.posterior(pc, train)
        if deterministic:
            lat = mean
        else:
            std = jnp.exp(0.5 * logvar)
            eps = jax.random.normal(self.make_rng("sample"), mean.shape, mean.dtype)
            lat = mean + std * eps
        kl = diagonal_gaussian_kl(mean, logvar)
        return kl, lat

    def decode(self, lat: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.decoder(self.fc(lat), train)

    def __call__(self, pc: jnp.ndarray, train: bool = False, deterministic: bool = False):
        kl, lat = self.encode(pc, train, deterministic)
        recon = self.decode(lat, train)
        return kl, lat, recon


def kl_autoencoder_loss(kl, recon, pc, kl_weight: float):
    """loss = chamfer + kl_weight * KL.  (foldingnet_autoencoder.py:374-390)"""
    dist1, dist2, _, _ = chamfer_distance(pc, recon)
    loss_cd = (dist1.mean(axis=1) + dist2.mean(axis=1)).mean()
    loss_kl = kl.mean()
    loss = loss_cd + loss_kl * kl_weight
    return loss, {"loss.cd": loss_cd, "loss.kl": loss_kl}
