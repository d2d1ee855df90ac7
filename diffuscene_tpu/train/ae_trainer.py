"""Jitted train/eval steps for the KL shape autoencoder.

Replaces the reference per-batch loop for `train_objautoencoder.py`
(`scene_synthesis/networks/foldingnet_autoencoder.py:394-420`): loss
(Pallas chamfer + KL), backward, global-norm clip, Adam update, and
BatchNorm running-stat updates all fuse into one XLA program, with the batch
sharded over the mesh 'data' axis.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.autoencoder import KLAutoEncoder, kl_autoencoder_loss
from ..parallel.mesh import batch_sharding, make_mesh, replicated
from .optim import optimizer_factory


@struct.dataclass
class AETrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class AETrainer:
    def __init__(self, model: KLAutoEncoder, training_cfg: Dict[str, Any],
                 mesh=None, steps_per_epoch: int = 500, n_points: int = 2048):
        self.model = model
        self.n_points = n_points
        self.tx = optimizer_factory(training_cfg, steps_per_epoch)
        self.mesh = mesh if mesh is not None else make_mesh()
        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)
        self._rep, self._bsh = rep, bsh

        def _train_step(state: AETrainState, pc, key):
            key = jax.random.fold_in(key, state.step)

            def loss_fn(params):
                (kl, lat, recon), updates = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    pc, train=True,
                    rngs={"sample": key},
                    mutable=["batch_stats"],
                )
                loss, loss_dict = kl_autoencoder_loss(kl, recon, pc, self.model.kl_weight)
                return loss, (loss_dict, updates["batch_stats"])

            (loss, (loss_dict, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            gnorm = optax.global_norm(grads)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(loss_dict)
            metrics["loss"] = loss
            metrics["gradnorm"] = gnorm
            return (
                AETrainState(step=state.step + 1, params=params,
                             batch_stats=new_bs, opt_state=opt_state),
                metrics,
            )

        def _eval_step(state: AETrainState, pc, key):
            kl, lat, recon = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                pc, train=False, deterministic=True,
            )
            loss, loss_dict = kl_autoencoder_loss(kl, recon, pc, self.model.kl_weight)
            metrics = dict(loss_dict)
            metrics["loss"] = loss
            return metrics

        def _encode(state: AETrainState, pc):
            """Deterministic latents for objfeat export (generate_objautoencoder.py:215-221)."""
            kl, lat = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                pc, train=False, deterministic=True, method=KLAutoEncoder.encode,
            )
            return lat

        self._train_step = jax.jit(
            _train_step, in_shardings=(rep, bsh, rep), out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(_eval_step, in_shardings=(rep, bsh, rep))
        self._encode = jax.jit(_encode, in_shardings=(rep, bsh))

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array, batch_size: int = 2) -> AETrainState:
        pc = jnp.zeros((batch_size, self.n_points, 3), jnp.float32)
        k_init, k_sample = jax.random.split(key)
        variables = self.model.init({"params": k_init, "sample": k_sample}, pc)
        params = jax.device_put(variables["params"], self._rep)
        batch_stats = jax.device_put(variables["batch_stats"], self._rep)
        opt_state = self.tx.init(params)
        return AETrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=batch_stats, opt_state=opt_state,
        )

    def put_batch(self, pc: np.ndarray) -> jnp.ndarray:
        return jax.device_put(np.asarray(pc, np.float32), self._bsh)

    def train_step(self, state, pc, key) -> Tuple[AETrainState, Dict]:
        return self._train_step(state, pc, key)

    def eval_step(self, state, pc, key) -> Dict:
        return self._eval_step(state, pc, key)

    def encode(self, state, pc) -> jnp.ndarray:
        return self._encode(state, pc)
