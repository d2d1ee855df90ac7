"""End-to-end golden tests of the completion / arrange splice chains vs the
LIVE reference loops (diffusion_ddpm.py:447-506).

test_task_apis.py checks our splice *semantics* (partials preserved, channel
groups preserved); these tests check *parity*: the reference torch loops and
our `lax.scan` loops, driven by the SAME weights (via the converter) and the
SAME noise stream, must produce the same scenes.  The noise stream is
generated from our samplers' exact key-split sequence and fed to the torch
side through a queue-backed ``noise_fn``.
"""
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference/scene_synthesis/networks"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available"
)

T = 20
B, N, D = 4, 12, 62


def _load_ref():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_convert_trained import _load_ref as load

    return load()


def _queue_noise_fn(torch, arrays):
    """torch noise_fn popping pre-generated arrays; shape-checked."""
    queue = list(arrays)

    def fn(size, dtype=None, device=None):
        a = queue.pop(0)
        assert tuple(size) == a.shape, (tuple(size), a.shape)
        return torch.from_numpy(a)

    return fn


def test_completion_chain_matches_reference():
    """RePaint completion: reference p_sample_loop_complete vs our scanned
    p_sample_loop_complete, identical weights + noise."""
    import torch

    import jax
    import jax.numpy as jnp
    from diffuscene_tpu.diffusion import make_schedule
    from diffuscene_tpu.diffusion import samplers as S
    from diffuscene_tpu.models import Unet1D
    from diffuscene_tpu.utils import convert_denoiser

    dn, dd = _load_ref()
    torch.manual_seed(1)
    kw = dict(dim=32, channels=D, objectness_dim=0, class_dim=22,
              translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
              context_dim=0, instanclass_dim=16, seperate_all=True)
    tnet = dn.Unet1D(dim_mults=[1, 1], **kw)
    tnet.eval()
    betas = dd.get_betas("linear", 1e-4, 0.02, T)
    config = {"translation_dim": 3, "size_dim": 3, "angle_dim": 2,
              "class_dim": 22, "objectness_dim": 0, "objfeat_dim": 32,
              "loss_type": "mse"}
    gd = dd.GaussianDiffusion(config, betas, "mse", "v", "fixedsmall",
                              True, False, None)

    params = convert_denoiser({k: v for k, v in tnet.state_dict().items()})
    jnet = Unet1D(dim_mults=(1, 1), **kw)
    sched = make_schedule("linear", 1e-4, 0.02, T, model_mean_type="v")

    rng = np.random.default_rng(7)
    cond = rng.normal(0, 1, (B, N, 16)).astype(np.float32)
    partial = rng.uniform(-1, 1, (B, 3, D)).astype(np.float32)
    jcond = jnp.asarray(cond)

    def jfn(x, t):
        return jnet.apply({"params": params}, x, t, jcond)

    # --- replicate our sampler's key-split sequence to pre-generate noise
    key = jax.random.PRNGKey(5)
    k, init_key = jax.random.split(key)
    noises = [np.asarray(jax.random.normal(init_key, (B, N, D), jnp.float32))]
    kk = k
    for _ in range(T):
        kk, k_noise, k_step = jax.random.split(kk, 3)
        noises.append(np.asarray(jax.random.normal(k_noise, partial.shape, jnp.float32)))
        noises.append(np.asarray(jax.random.normal(k_step, (B, N, D), jnp.float32)))

    # --- torch reference chain on the same stream
    tcond = torch.from_numpy(cond)
    with torch.no_grad():
        want = gd.p_sample_loop_complete(
            lambda x, tt, c, cc=None: tnet(x, tt, c, cc),
            (B, N, D), "cpu", tcond, None,
            noise_fn=_queue_noise_fn(torch, noises),
            clip_denoised=True, partial_boxes=torch.from_numpy(partial),
        ).numpy()

    got = np.asarray(jax.jit(
        lambda key: S.p_sample_loop_complete(
            sched, "v", "fixedsmall", jfn, (B, N, D), key,
            jnp.asarray(partial), True)
    )(key))

    np.testing.assert_allclose(got[:, :3], partial, atol=1e-6)  # spliced clean
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)
    assert float(np.abs(got - want).max()) < 5e-3


def test_arrange_chain_and_splice_match_reference():
    """Arrange: reference p_sample_loop_arrange (5-channel chain + t==0
    channel splice) vs our p_sample_loop_arrange + the scene_model splice
    formula, identical weights + noise.  Also exercises the converter on a
    seperate_all=False net."""
    import torch

    import jax
    import jax.numpy as jnp
    from diffuscene_tpu.diffusion import make_schedule
    from diffuscene_tpu.diffusion import samplers as S
    from diffuscene_tpu.models import Unet1D
    from diffuscene_tpu.utils import convert_denoiser

    dn, dd = _load_ref()
    torch.manual_seed(2)
    kw = dict(dim=32, channels=5, objectness_dim=0, class_dim=22,
              translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
              context_dim=0, instanclass_dim=16, seperate_all=False)
    tnet = dn.Unet1D(dim_mults=[1, 1], **kw)
    tnet.eval()
    betas = dd.get_betas("linear", 1e-4, 0.02, T)
    config = {"translation_dim": 3, "size_dim": 3, "angle_dim": 2,
              "class_dim": 22, "objectness_dim": 0, "objfeat_dim": 32,
              "loss_type": "mse"}
    gd = dd.GaussianDiffusion(config, betas, "mse", "v", "fixedsmall",
                              True, False, None)

    params = convert_denoiser({k: v for k, v in tnet.state_dict().items()})
    jnet = Unet1D(dim_mults=(1, 1), **kw)
    sched = make_schedule("linear", 1e-4, 0.02, T, model_mean_type="v")

    rng = np.random.default_rng(9)
    cond = rng.normal(0, 1, (B, N, 16)).astype(np.float32)
    input_boxes = rng.uniform(-1, 1, (B, N, D)).astype(np.float32)
    jcond = jnp.asarray(cond)

    def jfn(x, t):
        return jnet.apply({"params": params}, x, t, jcond)

    # our key stream: plain p_sample_loop on the (B, N, 5) sub-shape
    key = jax.random.PRNGKey(11)
    k, init_key = jax.random.split(key)
    noises = [np.asarray(jax.random.normal(init_key, (B, N, 5), jnp.float32))]
    kk = k
    for _ in range(T):
        kk, sub = jax.random.split(kk)
        noises.append(np.asarray(jax.random.normal(sub, (B, N, 5), jnp.float32)))

    tcond = torch.from_numpy(cond)
    with torch.no_grad():
        want = gd.p_sample_loop_arrange(
            lambda x, tt, c, cc=None: tnet(x, tt, c, cc),
            (B, N, D), "cpu", tcond, None,
            noise_fn=_queue_noise_fn(torch, noises),
            clip_denoised=True, input_boxes=torch.from_numpy(input_boxes),
        ).numpy()

    sub = np.asarray(jax.jit(
        lambda key: S.p_sample_loop_arrange(
            sched, "v", "fixedsmall", jfn, (B, N, D), key, 3, 2, True)
    )(key))
    assert sub.shape == (B, N, 5)
    # the scene_model.sample splice (models/scene_model.py input_boxes branch)
    got = np.concatenate(
        [sub[:, :, :3], input_boxes[:, :, 3:6], sub[:, :, 3:], input_boxes[:, :, 8:]],
        axis=-1)

    np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)


def test_trajectory_chain_matches_reference():
    """p_sample_loop_trajectory frame-for-frame vs the reference loop
    (diffusion_ddpm.py:373-398), same weights + noise stream."""
    import torch

    import jax
    import jax.numpy as jnp
    from diffuscene_tpu.diffusion import make_schedule
    from diffuscene_tpu.diffusion import samplers as S
    from diffuscene_tpu.models import Unet1D
    from diffuscene_tpu.utils import convert_denoiser

    dn, dd = _load_ref()
    torch.manual_seed(3)
    kw = dict(dim=32, channels=D, objectness_dim=0, class_dim=22,
              translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
              context_dim=0, instanclass_dim=16, seperate_all=True)
    tnet = dn.Unet1D(dim_mults=[1, 1], **kw)
    tnet.eval()
    betas = dd.get_betas("linear", 1e-4, 0.02, T)
    config = {"translation_dim": 3, "size_dim": 3, "angle_dim": 2,
              "class_dim": 22, "objectness_dim": 0, "objfeat_dim": 32,
              "loss_type": "mse"}
    gd = dd.GaussianDiffusion(config, betas, "mse", "v", "fixedsmall",
                              True, False, None)

    params = convert_denoiser({k: v for k, v in tnet.state_dict().items()})
    jnet = Unet1D(dim_mults=(1, 1), **kw)
    sched = make_schedule("linear", 1e-4, 0.02, T, model_mean_type="v")

    rng = np.random.default_rng(13)
    cond = rng.normal(0, 1, (B, N, 16)).astype(np.float32)
    jcond = jnp.asarray(cond)

    def jfn(x, t):
        return jnet.apply({"params": params}, x, t, jcond)

    freq = 5
    # our key stream: init draw, then one per step
    key = jax.random.PRNGKey(17)
    k, init_key = jax.random.split(key)
    noises = [np.asarray(jax.random.normal(init_key, (B, N, D), jnp.float32))]
    kk = k
    for _ in range(T):
        kk, sub = jax.random.split(kk)
        noises.append(np.asarray(jax.random.normal(sub, (B, N, D), jnp.float32)))

    with torch.no_grad():
        want = gd.p_sample_loop_trajectory(
            lambda x, tt, c, cc=None: tnet(x, tt, c, cc),
            (B, N, D), "cpu", freq, torch.from_numpy(cond), None,
            noise_fn=_queue_noise_fn(torch, noises), clip_denoised=True)
    want = np.stack([w.numpy() for w in want])

    got = np.asarray(jax.jit(
        lambda key: S.p_sample_loop_trajectory(
            sched, "v", "fixedsmall", jfn, (B, N, D), key, freq, True)
    )(key))

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)


def test_calc_bpd_loop_matches_reference():
    """Variational-bound sweep (total/vb/prior/mse) vs reference
    calc_bpd_loop (diffusion_ddpm.py:690-717), same weights + q_sample
    noise stream (reference draws it via torch.randn, patched to a queue)."""
    import torch

    import jax
    import jax.numpy as jnp
    from diffuscene_tpu.diffusion import make_schedule
    from diffuscene_tpu.diffusion.samplers import calc_bpd_loop
    from diffuscene_tpu.models import Unet1D
    from diffuscene_tpu.utils import convert_denoiser

    dn, dd = _load_ref()
    torch.manual_seed(4)
    kw = dict(dim=32, channels=D, objectness_dim=0, class_dim=22,
              translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
              context_dim=0, instanclass_dim=16, seperate_all=True)
    tnet = dn.Unet1D(dim_mults=[1, 1], **kw)
    tnet.eval()
    betas = dd.get_betas("linear", 1e-4, 0.02, T)
    config = {"translation_dim": 3, "size_dim": 3, "angle_dim": 2,
              "class_dim": 22, "objectness_dim": 0, "objfeat_dim": 32,
              "loss_type": "mse"}
    gd = dd.GaussianDiffusion(config, betas, "mse", "v", "fixedsmall",
                              True, False, None)
    params = convert_denoiser({k: v for k, v in tnet.state_dict().items()})
    jnet = Unet1D(dim_mults=(1, 1), **kw)
    sched = make_schedule("linear", 1e-4, 0.02, T, model_mean_type="v")

    rng = np.random.default_rng(21)
    cond = rng.normal(0, 1, (B, N, 16)).astype(np.float32)
    x_start = rng.uniform(-1, 1, (B, N, D)).astype(np.float32)
    jcond = jnp.asarray(cond)

    def jfn(x, t):
        return jnet.apply({"params": params}, x, t, jcond)

    # our scan's q_sample noise stream: one split per t, T-1 .. 0
    key = jax.random.PRNGKey(23)
    noises, kk = [], key
    for _ in range(T):
        kk, sub = jax.random.split(kk)
        noises.append(np.asarray(jax.random.normal(sub, (B, N, D), jnp.float32)))

    queue = list(noises)
    orig_randn = torch.randn

    def fake_randn(*size, **kwargs):
        shape = tuple(size[0]) if len(size) == 1 and isinstance(
            size[0], (tuple, list, torch.Size)) else tuple(size)
        a = queue.pop(0)
        assert shape == a.shape, (shape, a.shape)
        return torch.from_numpy(a)

    torch.randn = fake_randn
    try:
        with torch.no_grad():
            t_total, t_vb, t_prior, t_mse = gd.calc_bpd_loop(
                lambda x, tt, c, cc=None: tnet(x, tt, c, cc),
                torch.from_numpy(x_start), torch.from_numpy(cond), None,
                clip_denoised=True)
    finally:
        torch.randn = orig_randn
    assert not queue  # reference consumed the full stream

    j_total, j_vb, j_prior, j_mse = jax.jit(
        lambda key: calc_bpd_loop(sched, "v", "fixedsmall", jfn,
                                  jnp.asarray(x_start), key, True))(key)

    np.testing.assert_allclose(float(j_prior), float(t_prior), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(j_mse), float(t_mse), atol=1e-4, rtol=1e-4)
    # the vb term is dominated by the t=0 discretized-NLL of an untrained
    # v-model (magnitude ~1e14 here); f32 accumulation differences between
    # the torch loop and the scan land around 2e-4 relative
    np.testing.assert_allclose(float(j_vb), float(t_vb), rtol=1e-3)
    np.testing.assert_allclose(float(j_total), float(t_total), rtol=1e-3)
