"""Golden parity of the converted KLAutoEncoder vs the LIVE reference
(foldingnet_autoencoder.py:131-390), with shared weights and an injected
identical noise stream — the technique of tests/test_golden_splice.py.

Chain checked: encode (graph encoder -> posterior mean/logvar) ->
sample-with-injected-eps -> decode (two folding layers) -> chamfer + KL.
BatchNorm running stats are randomized before conversion so the
batch_stats mapping is genuinely exercised (not just identity stats).
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


def _load_ref_foldingnet():
    """Load foldingnet_autoencoder.py standalone.

    Needs two stubs: the CUDA chamfer extension (instantiated at import,
    foldingnet_autoencoder.py:9-10) gets a pure-torch oracle; the relative
    `..stats_logger` import (which pulls wandb) gets a dummy module.
    """
    import importlib.util

    import torch

    # --- stub ChamferDistancePytorch.chamfer3D.dist_chamfer_3D ---
    def _dist_chamfer(a, b):
        # pure-torch O(N*M) oracle (ChamferDistancePytorch/chamfer_python.py:4-39)
        d = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
        d1, i1 = d.min(2)
        d2, i2 = d.min(1)
        return d1, d2, i1.int(), i2.int()

    class chamfer_3DDist(torch.nn.Module):
        def forward(self, a, b):
            return _dist_chamfer(a, b)

    root = types.ModuleType("ChamferDistancePytorch")
    root.__path__ = []
    c3d = types.ModuleType("ChamferDistancePytorch.chamfer3D")
    c3d.__path__ = []
    dist = types.ModuleType("ChamferDistancePytorch.chamfer3D.dist_chamfer_3D")
    dist.chamfer_3DDist = chamfer_3DDist
    sys.modules.setdefault("ChamferDistancePytorch", root)
    sys.modules.setdefault("ChamferDistancePytorch.chamfer3D", c3d)
    sys.modules.setdefault("ChamferDistancePytorch.chamfer3D.dist_chamfer_3D", dist)

    # --- stub package + stats_logger so `..stats_logger` resolves ---
    pkg = types.ModuleType("refss")
    pkg.__path__ = [os.path.dirname(REF_DIR)]
    sys.modules.setdefault("refss", pkg)
    nets = types.ModuleType("refss.networks")
    nets.__path__ = [REF_DIR]
    sys.modules.setdefault("refss.networks", nets)
    sl = types.ModuleType("refss.stats_logger")

    class _DummyLogger:
        @classmethod
        def instance(cls):
            return cls()

        def __getattr__(self, name):
            return lambda *a, **k: None

    sl.StatsLogger = _DummyLogger
    sys.modules.setdefault("refss.stats_logger", sl)

    name = "refss.networks.foldingnet_autoencoder"
    if name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF_DIR, "foldingnet_autoencoder.py"))
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
    return sys.modules[name]


@pytest.fixture(scope="module")
def converted():
    torch = pytest.importorskip("torch")
    ref = _load_ref_foldingnet()
    torch.manual_seed(0)
    tae = ref.KLAutoEncoder(latent_dim=32, kl_weight=0.001)
    # randomize running stats so the batch_stats conversion is exercised
    gen = torch.Generator().manual_seed(1)
    for m in tae.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)
    tae.eval()

    from diffuscene_tpu.models.autoencoder import KLAutoEncoder
    from diffuscene_tpu.utils import convert_autoencoder

    variables = convert_autoencoder(tae.state_dict())
    jae = KLAutoEncoder(latent_dim=32, kl_weight=0.001)
    return torch, ref, tae, jae, variables


def test_converted_posterior_matches_reference(converted):
    torch, ref, tae, jae, variables = converted
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    pc = rng.uniform(-0.5, 0.5, (2, 256, 3)).astype(np.float32)

    with torch.no_grad():
        h = tae.encoder(torch.from_numpy(pc).permute(0, 2, 1))
        t_mean = tae.mean_fc(h).numpy()
        t_logvar = np.clip(tae.logvar_fc(h).numpy(), -30.0, 20.0)

    j_mean, j_logvar = jae.apply(variables, jnp.asarray(pc),
                                 method=jae.posterior)
    np.testing.assert_allclose(np.asarray(j_mean), t_mean, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_logvar), t_logvar, rtol=2e-4, atol=2e-4)


def test_converted_full_chain_matches_reference(converted):
    """encode -> sample(eps injected on both sides) -> decode -> chamfer+KL."""
    torch, ref, tae, jae, variables = converted
    import jax.numpy as jnp

    from diffuscene_tpu.models.autoencoder import diagonal_gaussian_kl
    from diffuscene_tpu.ops.chamfer import chamfer_oracle

    rng = np.random.default_rng(4)
    pc = rng.uniform(-0.5, 0.5, (2, 256, 3)).astype(np.float32)
    eps = rng.normal(0, 1, (2, 32)).astype(np.float32)

    with torch.no_grad():
        h = tae.encoder(torch.from_numpy(pc).permute(0, 2, 1))
        posterior = ref.DiagonalGaussianDistribution(
            tae.mean_fc(h), tae.logvar_fc(h))
        t_lat = (posterior.mean + posterior.std * torch.from_numpy(eps))
        t_kl = posterior.kl().numpy()
        t_recon = tae.decode(t_lat).numpy()  # (B, 2025, 3)
        t_d1, t_d2, _, _ = ref.cd_loss(torch.from_numpy(pc),
                                       torch.from_numpy(t_recon))

    j_mean, j_logvar = jae.apply(variables, jnp.asarray(pc), method=jae.posterior)
    j_lat = j_mean + jnp.exp(0.5 * j_logvar) * jnp.asarray(eps)
    j_kl = diagonal_gaussian_kl(j_mean, j_logvar)
    j_recon = jae.apply(variables, j_lat, method=jae.decode)

    np.testing.assert_allclose(np.asarray(j_lat), t_lat.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_kl), t_kl, rtol=2e-4, atol=2e-4)
    assert j_recon.shape == (2, 2025, 3) == t_recon.shape
    np.testing.assert_allclose(np.asarray(j_recon), t_recon,
                               rtol=1e-3, atol=1e-4)
    d1, d2, _, _ = chamfer_oracle(jnp.asarray(pc), j_recon)
    np.testing.assert_allclose(np.asarray(d1).mean(), t_d1.numpy().mean(),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d2).mean(), t_d2.numpy().mean(),
                               rtol=1e-3)


def test_converted_deterministic_encode_for_export(converted):
    """The lat32 export path (deterministic=True -> mean) matches the torch
    posterior mode (DiagonalGaussianDistribution.mode, :334-335)."""
    torch, ref, tae, jae, variables = converted
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    pc = rng.uniform(-0.5, 0.5, (2, 256, 3)).astype(np.float32)
    with torch.no_grad():
        h = tae.encoder(torch.from_numpy(pc).permute(0, 2, 1))
        t_mode = tae.mean_fc(h).numpy()
    kl, lat = jae.apply(variables, jnp.asarray(pc), deterministic=True,
                        method=jae.encode)
    np.testing.assert_allclose(np.asarray(lat), t_mode, rtol=2e-4, atol=2e-4)
