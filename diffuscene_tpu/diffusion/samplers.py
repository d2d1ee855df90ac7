"""Sampling loops as `lax.scan` bodies — fully jitted, batched.

TPU-native re-design of the reference Python sampling loops
(`scene_synthesis/networks/diffusion_ddpm.py:339-506`).  Where the reference
runs 1000 sequential Python-level denoiser calls at batch size 1
(generate_diffusion.py:294), these loops compile to a single XLA program: the
timestep loop is a `lax.scan`, the batch dimension carries many scenes at
once, and randomness is threaded via `jax.random` keys.

``denoise_fn(x, t) -> model_output`` closes over network params and the
per-scene conditioning; it must be jit-traceable.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule
from .gaussian import p_mean_variance, model_predictions, q_sample

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def p_sample_step(
    sched: DiffusionSchedule,
    model_mean_type: str,
    model_var_type: str,
    denoise_fn: DenoiseFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    clip_denoised: bool,
) -> jnp.ndarray:
    """One ancestral DDPM step.  (diffusion_ddpm.py:339-352)"""
    model_output = denoise_fn(x, t)
    model_mean, model_log_variance, _ = p_mean_variance(
        sched, model_mean_type, model_var_type, model_output, x, t, clip_denoised
    )
    noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    nonzero_mask = (t > 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
    return model_mean + nonzero_mask * jnp.exp(0.5 * model_log_variance) * noise


def p_sample_loop(
    sched: DiffusionSchedule,
    model_mean_type: str,
    model_var_type: str,
    denoise_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Full T-step DDPM ancestral sampling as one scan.  (diffusion_ddpm.py:355-371)"""
    key, init_key = jax.random.split(key)
    x_T = jax.random.normal(init_key, shape, dtype=jnp.float32)

    def body(carry, t_scalar):
        x, k = carry
        k, sub = jax.random.split(k)
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        x = p_sample_step(
            sched, model_mean_type, model_var_type, denoise_fn, x, t, sub, clip_denoised
        )
        return (x, k), None

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1, dtype=jnp.int32)
    (x_0, _), _ = jax.lax.scan(body, (x_T, key), ts)
    return x_0


def p_sample_loop_trajectory(
    sched: DiffusionSchedule,
    model_mean_type: str,
    model_var_type: str,
    denoise_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    freq: int,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """DDPM sampling that also returns intermediate frames every ``freq`` steps.

    Frame-exact mirror of reference p_sample_loop_trajectory
    (diffusion_ddpm.py:373-398), which emits after a step when
    ``t % freq == 0 or t == T - 1``: the returned array stacks
    [x_T, x_{after t=T-1}] + [x_t for t % freq == 0], i.e.
    (2 + T//freq, *shape) frames for freq > 1 (for freq == 1 the t == T-1
    frame coincides with the modulo frames: (1 + T, *shape)).

    Implemented as scans over frame chunks (1 step, then freq-1 steps, then
    T//freq - 1 chunks of freq steps) so only emitted frames materialize.
    """
    T = sched.num_timesteps
    assert T % freq == 0, "freq must divide num_timesteps for the fused trajectory scan"

    key, init_key = jax.random.split(key)
    x_T = jax.random.normal(init_key, shape, dtype=jnp.float32)

    def inner(carry, t_scalar):
        x, k = carry
        k, sub = jax.random.split(k)
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        x = p_sample_step(
            sched, model_mean_type, model_var_type, denoise_fn, x, t, sub, clip_denoised
        )
        return (x, k), None

    def chunk(x, k, ts):
        (x, k), _ = jax.lax.scan(inner, (x, k), ts)
        return x, k

    frames = [x_T]
    # reference emits after the very first step (t == T-1) ...
    x, k = chunk(x_T, key, jnp.array([T - 1], jnp.int32))
    frames.append(x)
    if freq > 1:
        # ... then after every t % freq == 0 step: first a freq-1 chunk
        # (t = T-2 .. T-freq), then uniform freq-sized chunks down to t=0
        x, k = chunk(x, k, jnp.arange(T - 2, T - freq - 1, -1, dtype=jnp.int32))
        frames.append(x)
        n_chunks = T // freq - 1

        def outer(carry, frame_idx):
            x, k = carry
            t_start = T - freq - 1 - frame_idx * freq
            ts = t_start - jnp.arange(freq, dtype=jnp.int32)
            x, k = chunk(x, k, ts)
            return (x, k), x

        (_, _), tail = jax.lax.scan(
            outer, (x, k), jnp.arange(n_chunks, dtype=jnp.int32))
        return jnp.concatenate([jnp.stack(frames), tail], axis=0)

    # freq == 1: every remaining step emits
    def outer1(carry, t_scalar):
        x, k = carry
        x, k = chunk(x, k, t_scalar[None])
        return (x, k), x

    (_, _), tail = jax.lax.scan(
        outer1, (x, k), jnp.arange(T - 2, -1, -1, dtype=jnp.int32))
    return jnp.concatenate([jnp.stack(frames), tail], axis=0)


def ddim_sample_loop(
    sched: DiffusionSchedule,
    model_mean_type: str,
    denoise_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    sampling_timesteps: int = 50,
    eta: float = 0.0,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """DDIM sampling over a strided timestep subsequence, as one scan.

    A corrected, functional version of reference ``ddim_sample_loop``
    (diffusion_ddpm.py:401-444 — which has latent bugs and is never called by
    the shipped scripts).  Uses the same time spacing:
    times = linspace(-1, T-1, steps+1), walked in reverse pairs.
    """
    import numpy as np

    T = sched.num_timesteps
    times = np.linspace(-1, T - 1, num=sampling_timesteps + 1).astype(np.int32)
    times = list(reversed(times.tolist()))
    time_pairs = np.array(list(zip(times[:-1], times[1:])), dtype=np.int32)  # (S, 2)

    key, init_key = jax.random.split(key)
    x_T = jax.random.normal(init_key, shape, dtype=jnp.float32)

    # append a 1.0 so that alphas_cumprod[-1] lookups for time_next == -1
    # yield alpha_next = 1 (x = x_start exactly at the last step).
    acp = jnp.concatenate([sched.alphas_cumprod, jnp.ones((1,), sched.alphas_cumprod.dtype)])

    def body(carry, pair):
        x, k = carry
        time, time_next = pair[0], pair[1]
        k, sub = jax.random.split(k)
        t = jnp.full((shape[0],), time, dtype=jnp.int32)
        model_output = denoise_fn(x, t)
        pred_noise, x_start = model_predictions(
            sched, model_mean_type, model_output, x, t, clip_x_start=clip_denoised
        )
        alpha = acp[time]
        alpha_next = acp[time_next]  # == 1.0 when time_next == -1
        sigma = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
        c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0, None))
        noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
        x_new = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
        # at the final step (time_next < 0) the sample is exactly x_start
        x_new = jnp.where(time_next < 0, x_start, x_new)
        return (x_new, k), None

    (x_0, _), _ = jax.lax.scan(body, (x_T, key), jnp.asarray(time_pairs))
    return x_0


def dpm_solver_sample_loop(
    sched: DiffusionSchedule,
    model_mean_type: str,
    denoise_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    sampling_timesteps: int = 20,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """DPM-Solver++(2M) sampling (Lu et al., arXiv 2211.01095) as one scan.

    A TPU-native fast sampler the reference does not ship: a second-order
    multistep ODE solver in data-prediction form, giving near-1000-step DDPM
    sample quality in ~20-50 model evaluations.  Shares the denoiser and
    timestep spacing conventions with ``ddim_sample_loop``.

    Update rule (data prediction, sigma_t = sqrt(1 - alpha_bar_t),
    a_t = sqrt(alpha_bar_t), lambda_t = log(a_t / sigma_t)):

        x_{i+1} = (sigma_{i+1}/sigma_i) x_i - a_{i+1} (e^{-h_i} - 1) D_i
        D_i     = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}   (first step: x0_i)

    with h_i = lambda_{i+1} - lambda_i and r_i = h_{i-1}/h_i.  e^{-h} is
    computed as the stable ratio (a_i sigma_{i+1})/(a_{i+1} sigma_i), which
    is exactly 0 at the final boundary (t_next = -1, alpha_bar = 1).

    Degenerate steps fall back to first order (D = x0):
    - the final boundary step — its h depends only on the numerical clip of
      sigma at alpha_bar = 1, so the second-order extrapolation coefficient
      there is an artifact (the "lower_order_final" rule of standard
      DPM-Solver implementations); the last update then returns x0 exactly;
    - h == 0 or h_prev == 0 (duplicate integer timesteps, which happen when
      sampling_timesteps > num_timesteps) — r would be 0/inf and D NaN.
    """
    import numpy as np

    T = sched.num_timesteps
    times = np.linspace(-1, T - 1, num=sampling_timesteps + 1).astype(np.int32)
    times = list(reversed(times.tolist()))
    time_pairs = np.array(list(zip(times[:-1], times[1:])), dtype=np.int32)  # (S, 2)

    key, init_key = jax.random.split(key)
    x_T = jax.random.normal(init_key, shape, dtype=jnp.float32)

    acp = jnp.concatenate([sched.alphas_cumprod, jnp.ones((1,), sched.alphas_cumprod.dtype)])
    a_all = jnp.sqrt(acp)
    sig_all = jnp.sqrt(jnp.clip(1.0 - acp, 1e-20, None))
    lam_all = jnp.log(a_all) - jnp.log(sig_all)

    def x0_of(x, t):
        model_output = denoise_fn(x, t)
        _, x_start = model_predictions(
            sched, model_mean_type, model_output, x, t, clip_x_start=clip_denoised
        )
        return x_start

    def body(carry, pair):
        x, x0_prev, h_prev, is_first = carry
        time, time_next = pair[0], pair[1]
        t = jnp.full((shape[0],), time, dtype=jnp.int32)
        x0 = x0_of(x, t)
        a_i, a_n = a_all[time], a_all[time_next]
        s_i, s_n = sig_all[time], sig_all[time_next]
        h = lam_all[time_next] - lam_all[time]
        h_safe = jnp.where(h == 0.0, 1.0, h)
        r = h_prev / h_safe
        r_safe = jnp.where(r == 0.0, 1.0, r)
        d_second = (1.0 + 1.0 / (2.0 * r_safe)) * x0 - (1.0 / (2.0 * r_safe)) * x0_prev
        first_order = is_first | (time_next < 0) | (h == 0.0) | (h_prev == 0.0)
        d = jnp.where(first_order, x0, d_second)
        exp_mh = (a_i * s_n) / (a_n * s_i)  # e^{-h}, exactly 0 at the final boundary
        x_new = (s_n / s_i) * x - a_n * (exp_mh - 1.0) * d
        return (x_new, x0, h, jnp.zeros_like(is_first)), None

    is_first = jnp.ones((), bool)
    (x_0, _, _, _), _ = jax.lax.scan(
        body, (x_T, jnp.zeros_like(x_T), jnp.ones(()), is_first), jnp.asarray(time_pairs)
    )
    return x_0


def p_sample_loop_complete(
    sched: DiffusionSchedule,
    model_mean_type: str,
    model_var_type: str,
    denoise_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    partial_boxes: jnp.ndarray,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """RePaint-style scene completion.  (diffusion_ddpm.py:447-476)

    At every step the first ``num_partial`` slots are overwritten with a
    freshly q-sampled noisy version of the clean partial boxes before the
    reverse step; after the final step the clean partials are spliced in.
    """
    num_partial = partial_boxes.shape[1]
    key, init_key = jax.random.split(key)
    x_T = jax.random.normal(init_key, shape, dtype=jnp.float32)

    def body(carry, t_scalar):
        x, k = carry
        k, k_noise, k_step = jax.random.split(k, 3)
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        noise = jax.random.normal(k_noise, partial_boxes.shape, dtype=x.dtype)
        partial_t = q_sample(sched, partial_boxes, t, noise)
        x = jnp.concatenate([partial_t, x[:, num_partial:, :]], axis=1)
        x = p_sample_step(
            sched, model_mean_type, model_var_type, denoise_fn, x, t, k_step, clip_denoised
        )
        return (x, k), None

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1, dtype=jnp.int32)
    (x_0, _), _ = jax.lax.scan(body, (x_T, key), ts)
    return jnp.concatenate([partial_boxes, x_0[:, num_partial:, :]], axis=1)


def p_sample_loop_arrange(
    sched: DiffusionSchedule,
    model_mean_type: str,
    model_var_type: str,
    denoise_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    translation_dim: int,
    angle_dim: int,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Re-arrangement sampling: diffuse only (translation, angle) channels.

    (diffusion_ddpm.py:478-506).  ``shape`` is the full (B, N, point_dim)
    scene shape; the returned array is (B, N, translation_dim + angle_dim).
    The caller splices translations/angles back into the conditioning boxes.
    """
    sub_shape = (shape[0], shape[1], translation_dim + angle_dim)
    return p_sample_loop(
        sched, model_mean_type, model_var_type, denoise_fn, sub_shape, key, clip_denoised
    )


def calc_bpd_loop(
    sched: DiffusionSchedule,
    model_mean_type: str,
    model_var_type: str,
    denoise_fn: DenoiseFn,
    x_start: jnp.ndarray,
    key: jax.Array,
    clip_denoised: bool = True,
):
    """Variational-bound bits-per-dim over all timesteps, as one scan.

    Functional port of reference ``calc_bpd_loop``
    (diffusion_ddpm.py:690-717), which runs a reversed Python loop over T
    with masked scatter updates; here the whole sweep is a single
    ``lax.scan`` emitting the per-(batch, t) terms directly.

    Returns (total_bpd mean, vb_terms mean, prior_bpd mean, mse mean) —
    the same scalar summary tuple as the reference.
    """
    from .gaussian import prior_bpd, vb_terms_bpd

    B = x_start.shape[0]
    T = sched.num_timesteps

    def body(k, t_scalar):
        k, sub = jax.random.split(k)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        noise = jax.random.normal(sub, x_start.shape, x_start.dtype)
        data_t = q_sample(sched, x_start, t, noise)
        model_output = denoise_fn(data_t, t)
        vb, pred_xstart = vb_terms_bpd(
            sched, model_mean_type, model_var_type, model_output,
            x_start, data_t, t, clip_denoised,
        )
        mse = ((pred_xstart - x_start) ** 2).reshape(B, -1).mean(axis=-1)
        return k, (vb, mse)

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    _, (vals_bt, mse_bt) = jax.lax.scan(body, key, ts)  # (T, B) each
    prior = prior_bpd(sched, x_start)  # (B,)
    total = vals_bt.sum(axis=0) + prior
    return total.mean(), vals_bt.mean(), prior.mean(), mse_bt.mean()
