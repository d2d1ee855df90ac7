"""Mesh-sharded batched sampling — multi-chip scene generation.

The reference generates scenes strictly one-at-a-time on one GPU
(generate_diffusion.py:294).  Here the sampling batch shards over the mesh
'data' axis: params are replicated, the (B, N, C) noise/state tensors are
split across chips, and the 1000-step scan runs in lockstep on every chip
with zero inter-chip communication (sampling is embarrassingly parallel) —
XLA inserts nothing but the initial shard scatter and final gather.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from ..models.scene_model import SceneDiffusion
from .mesh import batch_sharding, make_mesh, replicated


class ShardedSampler:
    """Jitted, mesh-sharded wrapper over SceneDiffusion.sample."""

    def __init__(self, scene: SceneDiffusion, mesh=None, clip_denoised: bool = True,
                 ddim: bool = False, ddim_steps: int = 50,
                 dpm: bool = False, dpm_steps: int = 20, fused: bool = False):
        self.scene = scene
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_data = self.mesh.shape["data"]
        self._rep = replicated(self.mesh)
        self._bsh = batch_sharding(self.mesh)
        self._fns: Dict[int, callable] = {}
        self.clip_denoised = clip_denoised
        self.ddim = ddim
        self.ddim_steps = ddim_steps
        self.dpm = dpm
        self.dpm_steps = dpm_steps
        self.fused = fused

    def _fn(self, batch_size: int):
        fn = self._fns.get(batch_size)
        if fn is None:
            def sample(params, key, text_emb):
                return self.scene.sample(
                    params, key, batch_size=batch_size, text_emb=text_emb,
                    clip_denoised=self.clip_denoised,
                    ddim=self.ddim, ddim_steps=self.ddim_steps,
                    dpm=self.dpm, dpm_steps=self.dpm_steps, fused=self.fused,
                )

            fn = jax.jit(
                sample,
                in_shardings=(self._rep, self._rep, self._bsh if self.scene.cfg.text_condition else None),
                out_shardings=self._bsh,
                static_argnums=(),
            )
            self._fns[batch_size] = fn
        return fn

    def put_params(self, params):
        return jax.device_put(params, self._rep)

    def sample(self, params, key: jax.Array, batch_size: int,
               text_emb: Optional[np.ndarray] = None) -> np.ndarray:
        """Sample ``batch_size`` scenes sharded over the mesh.

        batch_size must be a multiple of the mesh 'data' axis; the caller
        rounds up and trims.
        """
        assert batch_size % self.n_data == 0, (batch_size, self.n_data)
        if text_emb is not None:
            text_emb = jax.device_put(np.asarray(text_emb, np.float32), self._bsh)
        out = self._fn(batch_size)(params, key, text_emb)
        return np.asarray(out)
