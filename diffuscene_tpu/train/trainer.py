"""Jitted training step + loop for the scene diffusion model.

Replaces the reference per-batch Python train loop
(`scripts/train_diffusion.py:221-255` + `diffusion_scene_layout_ddpm.py:456-482`)
with a single donated, mesh-sharded XLA program: loss, backward, global-norm
clip, optimizer update, and metric reduction all fuse under one jit.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.scene_model import SceneDiffusion
from ..parallel.mesh import batch_sharding, make_mesh, replicated
from .optim import f32_global_norm, optimizer_factory, lr_schedule_factory


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # Exponential moving average of params (None unless training.ema_decay
    # is set).  Samplers prefer these weights when present — standard
    # diffusion practice the reference does not implement.
    ema_params: Any = None


def ema_or_params(state: TrainState):
    """The weights a sampler should use from a restored TrainState."""
    ema = getattr(state, "ema_params", None)
    return ema if ema is not None else state.params


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


# batch entries that belong on device ("desc_emb" arrives from the data
# pipeline and is renamed to the model's "text_emb")
_DEVICE_BATCH_KEYS = frozenset({
    "translations", "sizes", "angles", "class_labels", "objectness",
    "objfeats", "objfeats_32", "room_feat", "text_emb", "room_layout",
    "packed",
})


class Trainer:
    """Owns the optimizer + jitted step functions for a SceneDiffusion model."""

    def __init__(
        self,
        scene: SceneDiffusion,
        training_cfg: Dict[str, Any],
        mesh=None,
        steps_per_epoch: int = 500,
        tensor_parallel: bool = False,
        mixed_precision: bool = False,
    ):
        """``tensor_parallel`` shards large denoiser kernels over the mesh
        'model' axis (parallel/tp.py) instead of replicating all params —
        GSPMD inserts the collectives; batch stays sharded over 'data'.

        ``mixed_precision`` casts the f32 master params to bfloat16 ONCE per
        step, outside ``value_and_grad``: the forward then sees already-bf16
        weights instead of casting each one inside the differentiated graph.
        Because the transpose of ``astype`` is the reverse cast, gradients
        are mathematically identical to the in-forward-cast formulation; the
        only numeric difference is that weight standardization moments
        (models/denoiser.py WSDense) are computed on bf16-rounded kernels
        (relative weight error ~2^-9 — below the bf16 rounding the matmul
        applies anyway).  Master params and the optimizer state stay f32.

        Measured on v5e (B=128, full-size denoiser, IoU loss): plain bf16
        8.72 ms/step, bf16+mixed_precision 10.49, f32 9.45 — the pre-cast is
        SLOWER here because the per-use standardize-then-cast fuses into the
        matmul prologs while the pre-cast pass adds a separate params-sized
        HBM round-trip.  Kept as an option for configs/hardware where the
        trade goes the other way; the CLIs default it off."""
        self.scene = scene
        self.training_cfg = training_cfg
        self.steps_per_epoch = steps_per_epoch
        self.tensor_parallel = tensor_parallel
        self.mixed_precision = mixed_precision
        # training.ema_decay (e.g. 0.9999): keep an exponential moving
        # average of the params in TrainState.ema_params; samplers use it
        # via ema_or_params().  training.grad_accum (int k): accumulate k
        # micro-batch gradients before each optimizer update
        # (optax.MultiSteps), for effective batches larger than device
        # memory.  Both are config keys (not CLI flags) so every CLI that
        # rebuilds the Trainer from the same YAML gets a matching
        # TrainState template for checkpoint restore.
        self.ema_decay = float(training_cfg.get("ema_decay", 0.0) or 0.0)
        self.grad_accum = int(training_cfg.get("grad_accum", 1) or 1)
        assert 0.0 <= self.ema_decay < 1.0, self.ema_decay
        assert self.grad_accum >= 1, self.grad_accum
        # training.grads_dtype: "bfloat16" casts gradients to bf16 right at
        # the backward boundary — XLA fuses the cast into the producing
        # kernels, so every later pass (global norm, Adam reads) moves half
        # the bytes.  ~2^-8 relative rounding on individual gradients; Adam
        # normalizes per-parameter scale, and convergence is validated on
        # the full-dress rehearsal recipe.  Pair with
        # training.adam_moment_dtype for the full low-precision optimizer.
        gd = training_cfg.get("grads_dtype", None)
        self.grads_dtype = jnp.dtype(gd) if gd else None
        # training.ema_dtype: "bfloat16" stores the EMA weights in bf16.
        # The EMA update is 3 extra params-sized passes per step (read e,
        # read p, write e); bf16 storage halves the e traffic.  Quality is
        # free for bf16 inference: samplers cast weights to the compute
        # dtype anyway, so a bf16-stored EMA equals the f32 EMA after the
        # cast up to one rounding.  The update still accumulates in f32.
        ed = training_cfg.get("ema_dtype", None)
        self.ema_dtype = jnp.dtype(ed) if ed else None
        tx = optimizer_factory(training_cfg, steps_per_epoch)

        # the scene variables may include a 'batch_stats' collection (frozen
        # BatchNorm statistics of the room-mask extractor); zero their
        # updates so "frozen" means frozen even though jax.grad produces
        # gradients for them
        def _frozen_stats_mask(tree):
            def walk(t, frozen):
                if isinstance(t, dict):
                    return {k: walk(v, frozen or k == "batch_stats") for k, v in t.items()}
                return frozen

            return walk(tree, False)

        self.tx = optax.chain(
            optax.masked(optax.set_to_zero(), _frozen_stats_mask), tx
        )
        if self.grad_accum > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=self.grad_accum)
        self.lr_schedule = lr_schedule_factory(training_cfg)
        self.mesh = mesh if mesh is not None else make_mesh()

        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)

        def _train_step(state: TrainState, batch, key):
            key = jax.random.fold_in(key, state.step)

            def loss_fn(params):
                return self.scene.get_loss(params, batch, key)

            if mixed_precision:
                compute_params = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
                    state.params,
                )
                (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    compute_params
                )
                grads = jax.tree.map(
                    lambda g, p: g.astype(p.dtype), grads, state.params
                )
            else:
                (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            if self.grads_dtype is not None:
                grads = jax.tree.map(
                    lambda g: g.astype(self.grads_dtype)
                    if g.dtype == jnp.float32 else g, grads)
            gnorm = f32_global_norm(grads)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if self.ema_decay > 0.0:
                d = self.ema_decay

                def ema_leaf(e, p):
                    # accumulate in f32 even when the EMA is stored bf16
                    ef = e.astype(jnp.float32)
                    new = d * ef + (1.0 - d) * p.astype(jnp.float32)
                    return new.astype(e.dtype)

                if self.grad_accum > 1:
                    # only average at MultiSteps boundaries (mini_step wraps
                    # to 0 right after the inner optimizer actually ran);
                    # params are frozen between boundaries, and decaying
                    # every micro-step would compound to d^k per real update
                    applied = opt_state.mini_step == 0
                    ema_params = jax.tree.map(
                        lambda e, p: jnp.where(applied, ema_leaf(e, p), e),
                        state.ema_params, params,
                    )
                else:
                    ema_params = jax.tree.map(ema_leaf, state.ema_params, params)
            else:
                ema_params = state.ema_params
            metrics = dict(loss_dict)
            metrics["loss"] = loss
            metrics["gradnorm"] = gnorm
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state, ema_params=ema_params)
            return new_state, metrics

        def _eval_step(state: TrainState, batch, key):
            loss, loss_dict = self.scene.get_loss(state.params, batch, key)
            metrics = dict(loss_dict)
            metrics["loss"] = loss
            return metrics

        if tensor_parallel:
            # shardings flow from the inputs (params placed by parallel/tp.py)
            self._train_step = jax.jit(_train_step, donate_argnums=(0,))
            self._eval_step = jax.jit(_eval_step)
        else:
            self._train_step = jax.jit(
                _train_step,
                in_shardings=(rep, bsh, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(_eval_step, in_shardings=(rep, bsh, rep))
        self._train_step_fn = _train_step  # unjitted core for train_step_scan
        self._train_scan_cache: Dict[int, Any] = {}
        self._bsh = bsh
        # stacked (k, B, ...) batches for train_step_scan: shard the BATCH
        # axis over 'data', replicate the scan axis
        from jax.sharding import NamedSharding, PartitionSpec

        self._stacked_bsh = NamedSharding(self.mesh, PartitionSpec(None, "data"))
        self._rep = rep

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array, batch_size: int = 2) -> TrainState:
        params = self.scene.init(key, batch_size)
        if self.tensor_parallel:
            from ..parallel.tp import shard_params

            params = shard_params(params, self.mesh)
            # jit so the optimizer state inherits the param shardings
            opt_state = jax.jit(self.tx.init)(params)
        else:
            params = jax.device_put(params, self._rep)
            opt_state = self.tx.init(params)
        # EMA starts as a COPY of params: aliasing the same buffers would
        # make the donated train step try to donate each buffer twice.
        # (A cast to ema_dtype is already a copy.)
        if self.ema_decay > 0.0:
            ed = self.ema_dtype
            ema = jax.tree.map(
                lambda p: p.astype(ed) if ed is not None else jnp.copy(p), params)
        else:
            ema = None
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, ema_params=ema)

    def put_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        out = {}
        for k, v in batch.items():
            if k == "desc_emb":  # data-pipeline name for precomputed text embeddings
                out["text_emb"] = jax.device_put(np.asarray(v, np.float32), self._bsh)
            elif k in _DEVICE_BATCH_KEYS:
                out[k] = jax.device_put(np.asarray(v, np.float32), self._bsh)
        return out

    def put_batches(self, batches) -> Dict[str, jnp.ndarray]:
        """Stack k host batches into (k, B, ...) device arrays for
        train_step_scan; the batch axis is sharded over 'data'."""
        host: Dict[str, np.ndarray] = {}
        for k in batches[0]:
            name = "text_emb" if k == "desc_emb" else k
            if name in _DEVICE_BATCH_KEYS:
                host[name] = np.stack(
                    [np.asarray(b[k], np.float32) for b in batches])
        return {k: jax.device_put(v, self._stacked_bsh) for k, v in host.items()}

    def train_step(self, state: TrainState, batch, key) -> Tuple[TrainState, Dict]:
        return self._train_step(state, batch, key)

    def train_step_scan(self, state: TrainState, batches, key) -> Tuple[TrainState, Dict]:
        """k train steps in ONE device dispatch via `lax.scan`.

        ``batches`` leaves carry a leading scan axis k (build with
        :meth:`put_batches`).  Numerically identical to k sequential
        :meth:`train_step` calls with the same ``key`` — each inner step
        folds the key from ``state.step`` exactly like the single-step path.
        Exists because host dispatch + transfer dominates short steps on
        remote TPU topologies.  Measured on the v5e tunnel (B=128, bf16,
        fresh host batches put before every dispatch): 35.5 ms/step
        single-step interleaved vs 11.8-18 ms/step with k=8 (8.1 ms/step
        device-bound; spread is tunnel variance) — a ~2-3x wall-clock win.  Put-then-dispatch is the
        right pattern: double-buffering the puts (putting chunk d+1 while
        the scan on chunk d runs) REGRESSES to 19.8 ms/step, because
        transfers issued while a program is in flight stall behind it on
        the tunnel.  No reference counterpart (its loop is
        one-batch-per-Python-iteration, train_diffusion.py:221-255).
        Returned metrics are the mean over the k steps.
        """
        k = int(jax.tree.leaves(batches)[0].shape[0])
        if k not in self._train_scan_cache:
            step_fn = self._train_step_fn

            def _scan(state, batches, key):
                def body(st, b):
                    st, m = step_fn(st, b, key)
                    return st, m

                st, ms = jax.lax.scan(body, state, batches)
                return st, jax.tree.map(lambda a: a.mean(0), ms)

            if self.tensor_parallel:
                self._train_scan_cache[k] = jax.jit(_scan, donate_argnums=(0,))
            else:
                self._train_scan_cache[k] = jax.jit(
                    _scan,
                    in_shardings=(self._rep, self._stacked_bsh, self._rep),
                    out_shardings=(self._rep, self._rep),
                    donate_argnums=(0,),
                )
        return self._train_scan_cache[k](state, batches, key)

    def eval_step(self, state: TrainState, batch, key) -> Dict:
        return self._eval_step(state, batch, key)

    def current_lr(self, step: int) -> float:
        return float(self.lr_schedule(step // max(self.steps_per_epoch, 1)))
