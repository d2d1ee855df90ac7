"""Mesh-sharded batched sampling — multi-chip scene generation.

The reference generates scenes strictly one-at-a-time on one GPU
(generate_diffusion.py:294).  Here the sampling batch shards over the mesh
'data' axis: params are replicated, the (B, N, C) noise/state tensors are
split across chips, and the 1000-step scan runs in lockstep on every chip
with zero inter-chip communication (sampling is embarrassingly parallel) —
XLA inserts nothing but the initial shard scatter and final gather.

All four task families shard the same way: unconditional / text-conditioned
ancestral (or ddim/dpm) chains, RePaint-splice completion (``partial_boxes``)
and rearrangement (``input_boxes``) — the conditioning tensors are
batch-sharded alongside the state (diffusion_ddpm.py:447-506 loops,
re-designed as lax.scans in diffusion/samplers.py).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

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
        self._fns: Dict[Tuple, callable] = {}
        self.clip_denoised = clip_denoised
        self.ddim = ddim
        self.ddim_steps = ddim_steps
        self.dpm = dpm
        self.dpm_steps = dpm_steps
        self.fused = fused

    def _fn(self, batch_size: int, has_text: bool, has_partial: bool,
            has_arrange: bool):
        key = (batch_size, has_text, has_partial, has_arrange)
        fn = self._fns.get(key)
        if fn is None:
            def sample(params, rng, text_emb, partial_boxes, input_boxes):
                return self.scene.sample(
                    params, rng, batch_size=batch_size, text_emb=text_emb,
                    partial_boxes=partial_boxes, input_boxes=input_boxes,
                    clip_denoised=self.clip_denoised,
                    ddim=self.ddim, ddim_steps=self.ddim_steps,
                    dpm=self.dpm, dpm_steps=self.dpm_steps, fused=self.fused,
                )

            fn = jax.jit(
                sample,
                in_shardings=(
                    self._rep, self._rep,
                    self._bsh if has_text else None,
                    self._bsh if has_partial else None,
                    self._bsh if has_arrange else None,
                ),
                out_shardings=self._bsh,
                static_argnums=(),
            )
            self._fns[key] = fn
        return fn

    def put_params(self, params):
        return jax.device_put(params, self._rep)

    def sample(self, params, key: jax.Array, batch_size: int,
               text_emb: Optional[np.ndarray] = None,
               partial_boxes: Optional[np.ndarray] = None,
               input_boxes: Optional[np.ndarray] = None) -> np.ndarray:
        """Sample ``batch_size`` scenes sharded over the mesh.

        batch_size must be a multiple of the mesh 'data' axis; the caller
        rounds up and trims.  ``partial_boxes`` runs the RePaint completion
        splice, ``input_boxes`` the rearrangement splice (both ancestral-only,
        see SceneDiffusion.sample).
        """
        assert batch_size % self.n_data == 0, (batch_size, self.n_data)
        if text_emb is not None:
            text_emb = jax.device_put(np.asarray(text_emb, np.float32), self._bsh)
        if partial_boxes is not None:
            partial_boxes = jax.device_put(
                np.asarray(partial_boxes, np.float32), self._bsh)
        if input_boxes is not None:
            input_boxes = jax.device_put(
                np.asarray(input_boxes, np.float32), self._bsh)
        fn = self._fn(batch_size, text_emb is not None,
                      partial_boxes is not None, input_boxes is not None)
        out = fn(params, key, text_emb, partial_boxes, input_boxes)
        return np.asarray(out)
