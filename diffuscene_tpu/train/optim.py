"""Optimizers and LR schedules (optax).

Equivalent of the reference optimizer/schedule factories
(`scene_synthesis/networks/__init__.py:15-34,78-168`): SGD / Adam / RAdam,
with 'step', 'lambda', and 'warmup_cosine' epoch-level schedules.  The
reference adjusts the LR once per epoch (`adjust_learning_rate`, called from
train_diffusion.py:225); we express the same schedules as trace-safe optax
schedules over the step counter (step -> epoch via steps_per_epoch), so the
whole update stays inside jit.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp
import optax


def lr_schedule_factory(training_cfg: Dict[str, Any]) -> Callable:
    """Return a trace-safe epoch -> lr schedule, mirroring
    schedule_factory/adjust_learning_rate (networks/__init__.py:127-168)."""
    name = training_cfg.get("schedule", "lambda")
    lr = float(training_cfg.get("lr", 1e-3))

    if name == "step":
        lr_step = int(training_cfg.get("lr_step", 10000))
        lr_decay = float(training_cfg.get("lr_decay", 0.5))

        def sched(epoch):
            return lr * (lr_decay ** (epoch // lr_step))

    elif name == "lambda":
        start_epoch = int(training_cfg.get("start_epoch", 1000))
        lr_decay = float(training_cfg.get("lr_decay", 0.999))

        def sched(epoch):
            epoch = jnp.asarray(epoch)
            return jnp.where(
                epoch < start_epoch,
                lr,
                lr * (lr_decay ** jnp.maximum(epoch - start_epoch, 0)),
            )

    elif name == "warmup_cosine":
        warmup = int(training_cfg.get("warmup_epochs", 500))
        total = int(training_cfg.get("epochs", 10000))
        min_lr = float(training_cfg.get("min_lr", 1e-6))

        def sched(epoch):
            epoch = jnp.asarray(epoch, jnp.float32)
            warm = lr * epoch / max(warmup, 1)
            p = (epoch - warmup) / max(total - warmup, 1)
            cos = min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(jnp.pi * p))
            return jnp.where(epoch < warmup, warm, cos)

    else:
        raise NotImplementedError(name)
    return sched


def optimizer_factory(
    training_cfg: Dict[str, Any], steps_per_epoch: int = 1
) -> optax.GradientTransformation:
    """Build the optax chain: grad-clip + optimizer + epoch-level LR schedule.

    Mirrors optimizer_factory (networks/__init__.py:15-34).  Note the
    reference forces weight_decay to 0.0 (line 23) regardless of config; we
    honor the config value but default it to 0.0 for parity.
    """
    name = training_cfg.get("optimizer", "Adam")
    wd = training_cfg.get("weight_decay", 0.0)
    momentum = training_cfg.get("momentum", 0.9)
    max_grad_norm = training_cfg.get("max_grad_norm", 10.0)
    epoch_sched = lr_schedule_factory(training_cfg)
    spe = max(int(steps_per_epoch), 1)

    def step_sched(step):
        # step -> epoch; the reference applies the new LR at epoch boundaries
        return epoch_sched(step // spe)

    if name == "SGD":
        opt = optax.sgd(learning_rate=step_sched, momentum=momentum)
    elif name == "Adam":
        if wd:
            opt = optax.adamw(learning_rate=step_sched, weight_decay=wd)
        else:
            opt = optax.adam(learning_rate=step_sched)
    elif name == "RAdam":
        opt = optax.radam(learning_rate=step_sched)
    else:
        raise NotImplementedError(name)

    return optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)


def freeze_mask(params, frozen_prefixes) -> "optax.GradientTransformation":
    """Zero updates for parameter subtrees whose top-level path starts with
    any of ``frozen_prefixes``.

    Functional equivalent of the reference's ``freeze_network``
    (frozen_batchnorm.py:71-75) / frozen text encoders: instead of mutating
    requires_grad, wrap the optimizer with `optax.masked`.
    Usage: ``tx = optax.chain(freeze_mask(params, ("feature_extractor",)), tx)``.
    """
    import jax

    def mask_tree(p):
        def walk(tree, path=()):
            if isinstance(tree, dict):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            return any(str(p0).startswith(tuple(frozen_prefixes)) for p0 in path)

        return walk(p)

    return optax.masked(optax.set_to_zero(), mask_tree(params))
