"""Trained-checkpoint conversion parity (VERDICT round-1 item 4).

test_convert.py validates the torch->Flax converter on randomly initialized
weights; this file trains the reference torch Unet1D (tiny dim, CPU, a few
hundred Adam steps on a synthetic fixture — scripts/train_diffusion.py:221-255
procedure at micro scale), converts the trained state_dict, and asserts

  (a) the converted model reproduces the torch training loss on a fixed
      (batch, t, noise) triple, and
  (b) a full deterministic-noise ancestral sampling chain (T=100, shared
      per-step noise injected into both sides) matches step-for-step to
      float32 tolerance.

This is the offline proxy for "FID within 2% of the PyTorch checkpoint"
(BASELINE.json): identical weights + identical noise => identical scenes.
"""
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/scene_synthesis/networks"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available"
)

T = 100
B, N, D = 16, 12, 62
NET_KWARGS = dict(
    dim=32, channels=62, objectness_dim=0, class_dim=22,
    translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
    context_dim=0, instanclass_dim=16, seperate_all=True,
)


def _load_ref():
    import importlib.machinery
    import importlib.util

    tk = types.ModuleType("tkinter")
    tk.__spec__ = importlib.machinery.ModuleSpec("tkinter", None)
    tk.__path__ = []
    tk.W = None
    sys.modules.setdefault("tkinter", tk)
    for sub, attrs in [("messagebox", {"NO": None}), ("tix", {"Tree": None})]:
        mod = types.ModuleType("tkinter." + sub)
        mod.__spec__ = importlib.machinery.ModuleSpec("tkinter." + sub, None)
        for a, v in attrs.items():
            setattr(mod, a, v)
        sys.modules.setdefault("tkinter." + sub, mod)
    pkg = types.ModuleType("refnets")
    pkg.__path__ = [REF_DIR]
    sys.modules.setdefault("refnets", pkg)
    for name in ("loss", "denoise_net", "diffusion_ddpm"):
        spec = importlib.util.spec_from_file_location(
            f"refnets.{name}", os.path.join(REF_DIR, f"{name}.py"))
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"refnets.{name}"] = m
        spec.loader.exec_module(m)
    return sys.modules["refnets.denoise_net"], sys.modules["refnets.diffusion_ddpm"]


@pytest.fixture(scope="module")
def trained():
    """Train the reference torch net for 200 steps; return (net, gd, cond)."""
    torch = pytest.importorskip("torch")
    dn, dd = _load_ref()
    torch.manual_seed(0)
    tnet = dn.Unet1D(dim_mults=[1, 1], **NET_KWARGS)
    betas = dd.get_betas("linear", 1e-4, 0.02, T)
    config = {"translation_dim": 3, "size_dim": 3, "angle_dim": 2,
              "class_dim": 22, "objectness_dim": 0, "objfeat_dim": 32,
              "loss_type": "mse"}
    gd = dd.GaussianDiffusion(config, betas, "mse", "v", "fixedsmall",
                              True, False, None)
    rng = np.random.default_rng(0)
    # memorizable fixture: 4 base scenes + small jitter (a real, learnable
    # data distribution — uniform noise has no signal to train on)
    base = rng.uniform(-1, 1, (4, N, D)).astype(np.float32)
    data = torch.from_numpy(
        np.clip(base[rng.integers(0, 4, 64)]
                + rng.normal(0, 0.05, (64, N, D)), -1, 1).astype(np.float32))
    cond = torch.from_numpy(rng.normal(0, 1, (1, N, 16)).astype(np.float32))

    def denoise(x, t, condition, condition_cross=None):
        return tnet(x, t, condition, condition_cross)

    opt = torch.optim.Adam(tnet.parameters(), lr=1e-3)
    history = []
    for step in range(500):
        idx = torch.from_numpy(rng.integers(0, 64, (B,)))
        batch = data[idx]
        t = torch.from_numpy(rng.integers(0, T, (B,)).astype(np.int64))
        noise = torch.from_numpy(rng.normal(0, 1, (B, N, D)).astype(np.float32))
        losses, _ = gd.p_losses(denoise, batch, t, noise,
                                cond.expand(B, -1, -1).contiguous(), None)
        loss = losses.mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        history.append(float(loss))
    first, last = np.mean(history[:20]), np.mean(history[-20:])
    # windowed means; the micro net plateaus quickly, ~13% drop is well above
    # the step-to-step noise and proves the weights moved off init
    assert last < first * 0.9, (first, last)
    tnet.eval()
    return tnet, gd, cond


def _converted(tnet):
    from diffuscene_tpu.models import Unet1D
    from diffuscene_tpu.utils import convert_denoiser

    params = convert_denoiser({k: v for k, v in tnet.state_dict().items()})
    jnet = Unet1D(dim_mults=(1, 1), **NET_KWARGS)
    return jnet, params


def test_trained_loss_parity(trained):
    import torch

    import jax.numpy as jnp
    from diffuscene_tpu.diffusion import (
        AttributeSpec, LossConfig, make_schedule)
    from diffuscene_tpu.diffusion.gaussian import p_losses, q_sample

    tnet, gd, cond = trained
    jnet, params = _converted(tnet)
    sched = make_schedule("linear", 1e-4, 0.02, T, model_mean_type="v")
    spec = AttributeSpec(translation_dim=3, size_dim=3, angle_dim=2,
                         class_dim=22, objectness_dim=0, objfeat_dim=32)
    cfg = LossConfig(model_mean_type="v", loss_separate=True, loss_iou=False)

    rng = np.random.default_rng(42)
    batch = rng.uniform(-1, 1, (B, N, D)).astype(np.float32)
    t = rng.integers(0, T, (B,)).astype(np.int64)
    noise = rng.normal(0, 1, (B, N, D)).astype(np.float32)
    tcond = cond.expand(B, -1, -1).contiguous()

    with torch.no_grad():
        want, _ = gd.p_losses(
            lambda x, tt, c, cc=None: tnet(x, tt, c, cc),
            torch.from_numpy(batch), torch.from_numpy(t),
            torch.from_numpy(noise), tcond, None)

    jt = jnp.asarray(t.astype(np.int32))
    data_t = q_sample(sched, jnp.asarray(batch), jt, jnp.asarray(noise))
    out = jnet.apply({"params": params}, data_t, jt,
                     jnp.asarray(tcond.numpy()))
    got, _ = p_losses(sched, spec, cfg, out, jnp.asarray(batch), data_t, jt,
                      jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4, rtol=2e-4)


def test_trained_sampling_chain_parity(trained):
    import torch

    import jax.numpy as jnp
    from diffuscene_tpu.diffusion import make_schedule
    from diffuscene_tpu.diffusion.gaussian import p_mean_variance

    tnet, gd, cond = trained
    jnet, params = _converted(tnet)
    sched = make_schedule("linear", 1e-4, 0.02, T, model_mean_type="v")

    nb = 4
    rng = np.random.default_rng(123)
    x = rng.normal(0, 1, (nb, N, D)).astype(np.float32)
    step_noise = rng.normal(0, 1, (T, nb, N, D)).astype(np.float32)
    tcond = cond.expand(nb, -1, -1).contiguous()
    jcond = jnp.asarray(tcond.numpy())

    tx = torch.from_numpy(x.copy())
    jx = jnp.asarray(x.copy())
    with torch.no_grad():
        for step in reversed(range(T)):
            tt = torch.full((nb,), step, dtype=torch.int64)
            tx = gd.p_sample(
                lambda x_, t_, c, cc=None: tnet(x_, t_, c, cc), tx, tt, tcond,
                None, noise_fn=lambda size, dtype, device: torch.from_numpy(
                    step_noise[step]),
                clip_denoised=True, return_pred_xstart=False)

            jt = jnp.full((nb,), step, jnp.int32)
            out = jnet.apply({"params": params}, jx, jt, jcond)
            mean, logvar, _ = p_mean_variance(
                sched, "v", "fixedsmall", out, jx, jt, clip_denoised=True)
            mask = 0.0 if step == 0 else 1.0
            jx = mean + mask * jnp.exp(0.5 * logvar) * jnp.asarray(step_noise[step])

            if step % 25 == 0:
                np.testing.assert_allclose(
                    np.asarray(jx), tx.numpy(), atol=5e-4, rtol=1e-3,
                    err_msg=f"diverged at t={step}")
    np.testing.assert_allclose(np.asarray(jx), tx.numpy(), atol=5e-4, rtol=1e-3)
    assert np.isfinite(np.asarray(jx)).all()
