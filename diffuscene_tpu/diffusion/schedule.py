"""Diffusion noise schedules, precomputed on host in float64.

TPU-native rework of the schedule/coefficient machinery in the reference
(`scene_synthesis/networks/diffusion_ddpm.py:45-203`).  All per-timestep
coefficient vectors are computed once in numpy float64 (the reference does the
same for accuracy, see diffusion_ddpm.py:160) and stored as a frozen pytree of
float32 device arrays so the whole schedule can be closed over by `jit` /
donated into `lax.scan` sampling loops.
"""
from __future__ import annotations

import dataclasses
import math
import jax
import jax.numpy as jnp
import numpy as np


def get_betas(schedule_type: str, b_start: float, b_end: float, time_num: int) -> np.ndarray:
    """Beta schedule (float64). Mirrors reference semantics (diffusion_ddpm.py:45-91).

    Supported: linear, warm0.1 / warm0.2 / warm0.5, cosine.

    Note: the reference's ``cosine`` branch computes the cosine betas and then
    discards them (a bug at diffusion_ddpm.py:84-88, falling through with an
    unbound variable).  We implement cosine correctly.
    """
    if schedule_type == "linear":
        betas = np.linspace(b_start, b_end, time_num, dtype=np.float64)
    elif schedule_type.startswith("warm"):
        frac = float(schedule_type[len("warm"):])
        betas = b_end * np.ones(time_num, dtype=np.float64)
        warmup_time = int(time_num * frac)
        betas[:warmup_time] = np.linspace(b_start, b_end, warmup_time, dtype=np.float64)
    elif schedule_type == "cosine":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = np.array(
            [
                min(1.0 - alpha_bar((i + 1) / time_num) / alpha_bar(i / time_num), 0.999)
                for i in range(time_num)
            ],
            dtype=np.float64,
        )
    else:
        raise NotImplementedError(schedule_type)
    assert (betas > 0).all() and (betas <= 1).all()
    return betas


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep coefficient vectors, shape (T,), float32 on device.

    Mirrors the coefficient set precomputed by the reference GaussianDiffusion
    constructor (diffusion_ddpm.py:159-203).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    loss_weight: jnp.ndarray
    # log-variance vector used when model_var_type == 'fixedlarge'
    fixedlarge_log_variance: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    schedule_type: str = "linear",
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
    time_num: int = 1000,
    model_mean_type: str = "eps",
    dtype=jnp.float32,
) -> DiffusionSchedule:
    betas = get_betas(schedule_type, beta_start, beta_end, time_num)
    return schedule_from_betas(betas, model_mean_type=model_mean_type, dtype=dtype)


def schedule_from_betas(
    betas: np.ndarray, model_mean_type: str = "eps", dtype=jnp.float32
) -> DiffusionSchedule:
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(np.maximum(posterior_variance, 1e-20))
    posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_mean_coef2 = (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)

    snr = alphas_cumprod / (1.0 - alphas_cumprod)
    if model_mean_type == "eps":
        loss_weight = np.ones_like(snr)
    elif model_mean_type == "x0":
        loss_weight = snr
    elif model_mean_type == "v":
        loss_weight = snr / (snr + 1.0)
    else:
        raise NotImplementedError(model_mean_type)

    # 'fixedlarge' uses beta_t as variance with the first posterior variance
    # spliced in for t=0 (diffusion_ddpm.py:318-319).
    fixedlarge_log_variance = np.log(
        np.concatenate([posterior_variance[1:2], betas[1:]])
    )

    as_dev = lambda a: jnp.asarray(a, dtype=dtype)
    return DiffusionSchedule(
        betas=as_dev(betas),
        alphas_cumprod=as_dev(alphas_cumprod),
        alphas_cumprod_prev=as_dev(alphas_cumprod_prev),
        sqrt_alphas_cumprod=as_dev(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=as_dev(posterior_variance),
        posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
        posterior_mean_coef1=as_dev(posterior_mean_coef1),
        posterior_mean_coef2=as_dev(posterior_mean_coef2),
        loss_weight=as_dev(loss_weight),
        fixedlarge_log_variance=as_dev(fixedlarge_log_variance),
    )


def extract(a: jnp.ndarray, t: jnp.ndarray, x_ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape to broadcast over x.

    ``a`` is (T,), ``t`` is (B,) int32; result is (B, 1, ..., 1) with x_ndim dims.
    Equivalent of reference `_extract` (diffusion_ddpm.py:205-215).
    """
    out = jnp.take(a, t, axis=0)
    return out.reshape(out.shape[0], *([1] * (x_ndim - 1)))
