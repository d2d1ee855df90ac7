"""Functional Gaussian diffusion core (q/p math, parameterizations, losses).

TPU-native, purely functional re-design of the reference GaussianDiffusion
class (`scene_synthesis/networks/diffusion_ddpm.py:125-717`).  Everything here
is a pure function over (schedule, arrays) so it can be jitted, vmapped, and
scanned; randomness is threaded through explicit `jax.random` keys instead of
the reference's global torch RNG.

Scene layout convention: ``x`` is (B, N, C) where N is the (padded) number of
object slots and C = translation(3) + size(3) + angle(1|2) + class + objectness
+ objfeat, matching the packing order of the reference
(`diffusion_scene_layout_ddpm.py:148-160`).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from .schedule import DiffusionSchedule, extract
from ..ops.iou3d import axis_aligned_bbox_overlaps_3d


class ModelPrediction(NamedTuple):
    pred_noise: jnp.ndarray
    pred_x_start: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class AttributeSpec:
    """Static layout of the per-object attribute vector.

    Mirrors the dimension bookkeeping of the reference GaussianDiffusion
    constructor (diffusion_ddpm.py:128-134).  With the shipped configs:
    translation 3, size 3, angle 2 (cos/sin), class 22|25 (last channel =
    "empty"), objectness 0, objfeat 32.
    """

    translation_dim: int = 3
    size_dim: int = 3
    angle_dim: int = 2
    class_dim: int = 22
    objectness_dim: int = 0
    objfeat_dim: int = 32

    @property
    def bbox_dim(self) -> int:
        return self.translation_dim + self.size_dim + self.angle_dim

    @property
    def point_dim(self) -> int:
        return self.bbox_dim + self.class_dim + self.objectness_dim + self.objfeat_dim

    # --- slices into the packed attribute vector ---
    @property
    def trans_slice(self):
        return slice(0, self.translation_dim)

    @property
    def size_slice(self):
        return slice(self.translation_dim, self.translation_dim + self.size_dim)

    @property
    def angle_slice(self):
        return slice(self.translation_dim + self.size_dim, self.bbox_dim)

    @property
    def class_slice(self):
        return slice(self.bbox_dim, self.bbox_dim + self.class_dim)

    @property
    def objectness_slice(self):
        s = self.bbox_dim + self.class_dim
        return slice(s, s + self.objectness_dim)

    @property
    def objfeat_slice(self):
        s = self.bbox_dim + self.class_dim + self.objectness_dim
        return slice(s, s + self.objfeat_dim)

    @property
    def empty_slice(self):
        """Channel(s) whose sign marks an empty slot.

        With objectness_dim == 0 the last class channel is the "empty"
        indicator (empty ⇔ value > 0); otherwise the dedicated objectness
        channel is used (empty ⇔ value < 0).  See diffusion_ddpm.py:613-618.
        """
        if self.objectness_dim > 0:
            return self.objectness_slice
        s = self.bbox_dim + self.class_dim - 1
        return slice(s, s + 1)


# ---------------------------------------------------------------------------
# forward process q
# ---------------------------------------------------------------------------

def q_sample(sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """x_t = sqrt(a_bar) x_0 + sqrt(1-a_bar) eps.  (diffusion_ddpm.py:276-286)"""
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_mean_variance(sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray):
    mean = extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    variance = extract(1.0 - sched.alphas_cumprod, t, x_start.ndim)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, x_start.ndim)
    return mean, variance, log_variance


def q_posterior_mean_variance(sched: DiffusionSchedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray):
    """Posterior q(x_{t-1} | x_t, x_0).  (diffusion_ddpm.py:289-302)"""
    posterior_mean = (
        extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    posterior_variance = extract(sched.posterior_variance, t, x_t.ndim)
    posterior_log_variance = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return posterior_mean, posterior_variance, posterior_log_variance


# ---------------------------------------------------------------------------
# parameterizations
# ---------------------------------------------------------------------------

def predict_xstart_from_eps(sched, x_t, t, eps):
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
    )


def predict_eps_from_xstart(sched, x_t, t, x0):
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def predict_v(sched, x0, t, eps):
    return (
        extract(sched.sqrt_alphas_cumprod, t, x0.ndim) * eps
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * x0
    )


def predict_xstart_from_v(sched, x_t, t, v):
    return (
        extract(sched.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
    )


def model_predictions(
    sched: DiffusionSchedule,
    model_mean_type: str,
    model_output: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    clip_x_start: bool = False,
) -> ModelPrediction:
    """Convert raw network output to (eps, x0).  (diffusion_ddpm.py:242-264)"""
    clip = (lambda x: jnp.clip(x, -1.0, 1.0)) if clip_x_start else (lambda x: x)
    if model_mean_type == "eps":
        pred_noise = model_output
        x_start = clip(predict_xstart_from_eps(sched, x_t, t, pred_noise))
    elif model_mean_type == "x0":
        x_start = clip(model_output)
        pred_noise = predict_eps_from_xstart(sched, x_t, t, x_start)
    elif model_mean_type == "v":
        x_start = clip(predict_xstart_from_v(sched, x_t, t, model_output))
        pred_noise = predict_eps_from_xstart(sched, x_t, t, x_start)
    else:
        raise NotImplementedError(model_mean_type)
    return ModelPrediction(pred_noise, x_start)


def p_mean_variance(
    sched: DiffusionSchedule,
    model_mean_type: str,
    model_var_type: str,
    model_output: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool,
):
    """Reverse-step mean/log-variance.  (diffusion_ddpm.py:305-335)"""
    preds = model_predictions(sched, model_mean_type, model_output, x_t, t, clip_x_start=clip_denoised)
    x_recon = preds.pred_x_start
    if model_var_type == "fixedsmall":
        model_log_variance = extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    elif model_var_type == "fixedlarge":
        model_log_variance = extract(sched.fixedlarge_log_variance, t, x_t.ndim)
    else:
        raise NotImplementedError(model_var_type)
    model_mean, _, _ = q_posterior_mean_variance(sched, x_recon, x_t, t)
    return model_mean, model_log_variance, x_recon


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal gaussians.  (diffusion_ddpm.py:96-101)"""
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + (mean1 - mean2) ** 2 * jnp.exp(-logvar2)
    )


# ---------------------------------------------------------------------------
# training losses
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss configuration (diffusion_ddpm.py:126-152)."""

    model_mean_type: str = "v"
    model_var_type: str = "fixedsmall"
    loss_type: str = "mse"
    loss_separate: bool = True
    loss_iou: bool = True
    room_arrange_condition: bool = False
    iou_weight: float = 0.1


def _mean_tail(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dims -> (B,)."""
    return x.reshape(x.shape[0], -1).mean(axis=-1)


def descale_to_origin(x, minimum, maximum):
    """[-1,1] -> original world units.  (diffusion_ddpm.py:668-675)"""
    x = (x + 1.0) / 2.0
    return x * (maximum - minimum)[None, None, :] + minimum[None, None, :]


def iou_regularizer(
    sched: DiffusionSchedule,
    spec: AttributeSpec,
    cfg: LossConfig,
    x_recon: jnp.ndarray,
    t: jnp.ndarray,
    bounds: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise bbox-IoU penalty on the reconstructed scene.

    Matches reference semantics (diffusion_ddpm.py:600-635): clamp x0 to
    [-1,1], descale translations/sizes to world units with the train-set
    bounds, form axis-aligned corners [c-s, c+s] (sizes are half-extents),
    compute the full pairwise IoU matrix (diagonal included, as in the
    reference), mask to valid (non-empty) objects, weight by
    alphas_cumprod[t] * iou_weight, and normalize by the valid-pair count.

    Returns (loss_iou_valid_avg, bbox_iou_valid_avg) each of shape (B,).
    """
    x_recon = jnp.clip(x_recon, -1.0, 1.0)
    trans = x_recon[:, :, spec.trans_slice]
    sizes = x_recon[:, :, spec.size_slice]
    empty = x_recon[:, :, spec.empty_slice]
    if spec.objectness_dim > 0:
        valid = (empty >= 0).astype(x_recon.dtype)[..., 0]
    else:
        valid = (empty <= 0).astype(x_recon.dtype)[..., 0]

    descale_trans = descale_to_origin(trans, bounds["translations_min"], bounds["translations_max"])
    descale_sizes = descale_to_origin(sizes, bounds["sizes_min"], bounds["sizes_max"])
    corners = jnp.concatenate([descale_trans - descale_sizes, descale_trans + descale_sizes], axis=-1)
    bbox_iou = axis_aligned_bbox_overlaps_3d(corners, corners)  # (B, N, N)
    pair_mask = valid[:, :, None] * valid[:, None, :]
    bbox_iou_valid = bbox_iou * pair_mask

    w_iou = extract(sched.alphas_cumprod, t, bbox_iou.ndim)
    denom = pair_mask.reshape(pair_mask.shape[0], -1).sum(axis=-1) + 1e-6
    loss_iou_valid_avg = (w_iou * cfg.iou_weight * bbox_iou_valid).reshape(x_recon.shape[0], -1).sum(axis=-1) / denom
    bbox_iou_valid_avg = bbox_iou_valid.reshape(x_recon.shape[0], -1).sum(axis=-1) / denom
    return loss_iou_valid_avg, bbox_iou_valid_avg


def p_losses(
    sched: DiffusionSchedule,
    spec: AttributeSpec,
    cfg: LossConfig,
    denoise_out: jnp.ndarray,
    data_start: jnp.ndarray,
    data_t: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    bounds: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-sample training loss, given the denoiser output.

    Functional port of the MSE branch of reference ``p_losses``
    (diffusion_ddpm.py:520-665): per-attribute MSE decomposition, optional
    `loss_separate` summation, SNR loss weighting, and the IoU regularizer.

    Returns (losses_weight (B,), loss_dict of scalars).
    """
    if cfg.model_mean_type == "eps":
        target = noise
    elif cfg.model_mean_type == "x0":
        target = data_start
    elif cfg.model_mean_type == "v":
        target = predict_v(sched, data_start, t, noise)
    else:
        raise NotImplementedError(cfg.model_mean_type)

    diff2 = (target - denoise_out) ** 2

    if cfg.room_arrange_condition:
        # arrange mode diffuses only (translation, angle) channels
        td = spec.translation_dim
        loss_trans = _mean_tail(diff2[:, :, :td])
        loss_angle = _mean_tail(diff2[:, :, td:])
        if cfg.loss_separate:
            losses = loss_trans + loss_angle
        else:
            losses = _mean_tail(diff2)
        losses_weight = losses * extract(sched.loss_weight, t, losses.ndim)
        return losses_weight, {
            "loss.trans": loss_trans.mean(),
            "loss.angle": loss_angle.mean(),
        }

    loss_trans = _mean_tail(diff2[:, :, spec.trans_slice])
    loss_size = _mean_tail(diff2[:, :, spec.size_slice])
    loss_angle = _mean_tail(diff2[:, :, spec.angle_slice])
    loss_bbox = _mean_tail(diff2[:, :, : spec.bbox_dim])
    loss_class = _mean_tail(diff2[:, :, spec.class_slice])
    loss_object = _mean_tail(diff2[:, :, spec.empty_slice])
    if spec.objfeat_dim > 0:
        loss_objfeat = _mean_tail(diff2[:, :, spec.objfeat_slice])
    else:
        loss_objfeat = jnp.zeros(data_start.shape[0], dtype=data_start.dtype)

    if cfg.loss_separate:
        losses = loss_bbox + loss_class
        if spec.objectness_dim > 0:
            losses = losses + loss_object
        if spec.objfeat_dim > 0:
            losses = losses + loss_objfeat
    else:
        losses = _mean_tail(diff2)

    losses_weight = losses * extract(sched.loss_weight, t, losses.ndim)

    if cfg.loss_iou:
        assert bounds is not None, "loss_iou requires train-stat bounds"
        if cfg.model_mean_type == "eps":
            x_recon = predict_xstart_from_eps(sched, data_t, t, denoise_out)
        elif cfg.model_mean_type == "x0":
            x_recon = denoise_out
        else:
            x_recon = predict_xstart_from_v(sched, data_t, t, denoise_out)
        loss_iou_valid_avg, bbox_iou_valid_avg = iou_regularizer(
            sched, spec, cfg, x_recon, t, bounds
        )
        losses_weight = losses_weight + loss_iou_valid_avg
    else:
        loss_iou_valid_avg = jnp.zeros_like(losses)
        bbox_iou_valid_avg = jnp.zeros_like(losses)

    loss_dict = {
        "loss.bbox": loss_bbox.mean(),
        "loss.trans": loss_trans.mean(),
        "loss.size": loss_size.mean(),
        "loss.angle": loss_angle.mean(),
        "loss.class": loss_class.mean(),
        "loss.object": loss_object.mean(),
        "loss.objfeat": loss_objfeat.mean(),
        "loss.liou": loss_iou_valid_avg.mean(),
        "loss.bbox_iou": bbox_iou_valid_avg.mean(),
    }
    return losses_weight, loss_dict


def vb_terms_bpd(
    sched: DiffusionSchedule,
    model_mean_type: str,
    model_var_type: str,
    model_output: jnp.ndarray,
    data_start: jnp.ndarray,
    data_t: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool,
):
    """Variational-bound KL term in bits/dim.  (diffusion_ddpm.py:511-518)"""
    true_mean, _, true_log_var = q_posterior_mean_variance(sched, data_start, data_t, t)
    model_mean, model_log_var, pred_xstart = p_mean_variance(
        sched, model_mean_type, model_var_type, model_output, data_t, t, clip_denoised
    )
    kl = normal_kl(true_mean, true_log_var, model_mean, model_log_var)
    kl = _mean_tail(kl) / jnp.log(2.0)
    return kl, pred_xstart


def prior_bpd(sched: DiffusionSchedule, x_start: jnp.ndarray) -> jnp.ndarray:
    """KL(q(x_T|x_0) || N(0,I)) in bits/dim.  (diffusion_ddpm.py:679-688)"""
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, dtype=jnp.int32)
    qt_mean, _, qt_log_var = q_mean_variance(sched, x_start, t)
    kl_prior = normal_kl(qt_mean, qt_log_var, jnp.zeros_like(qt_mean), jnp.zeros_like(qt_log_var))
    return _mean_tail(kl_prior) / jnp.log(2.0)
