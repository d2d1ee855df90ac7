"""Flax -> torch state_dict export (utils/export.py), the inverse of the
checkpoint converter: TPU-trained weights flow back into the reference
implementation.

Each test round-trips a live reference state_dict (torch -> convert ->
export -> exact equality), and the denoiser test additionally perturbs the
flax params, exports, `load_state_dict(strict=True)`s into a FRESH
reference net, and asserts the torch forward matches our flax forward —
the actual train-on-TPU / deploy-on-torch use case.
"""
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference/scene_synthesis/networks"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available"
)

NET_KWARGS = dict(
    dim=32, dim_mults=[1, 1], channels=62, objectness_dim=0, class_dim=22,
    translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
    context_dim=0, instanclass_dim=16, seperate_all=True,
    text_condition=True, text_dim=24,
)


def _ref_denoiser():
    sys.path.insert(0, os.path.dirname(__file__))
    try:
        from test_convert import _load_ref_denoise
    finally:
        sys.path.pop(0)
    return _load_ref_denoise()


def _assert_state_dicts_equal(exported, want, atol=0.0):
    import torch

    assert set(exported) == set(want)
    for k in want:
        w = want[k]
        w = w.detach().cpu().numpy() if isinstance(w, torch.Tensor) else np.asarray(w)
        e = exported[k]
        e = e.detach().cpu().numpy() if isinstance(e, torch.Tensor) else np.asarray(e)
        assert e.shape == w.shape, k
        np.testing.assert_allclose(e, w.astype(e.dtype), atol=atol, rtol=0, err_msg=k)


def test_denoiser_roundtrip_and_torch_forward_parity():
    import torch

    import jax
    from diffuscene_tpu.models import Unet1D
    from diffuscene_tpu.utils.convert import convert_denoiser
    from diffuscene_tpu.utils.export import export_denoiser, to_torch_state_dict

    ref = _ref_denoiser()
    torch.manual_seed(0)
    tnet = ref.Unet1D(**NET_KWARGS)
    tnet.eval()
    sd = dict(tnet.state_dict())

    params = convert_denoiser(sd)
    # exact roundtrip: export(convert(sd)) == sd
    _assert_state_dicts_equal(export_denoiser(params, sd), sd)

    # one-way: perturbed flax params -> torch net forward == flax forward
    rng = np.random.default_rng(0)
    perturbed = jax.tree.map(
        lambda a: np.asarray(a) + rng.normal(0, 0.02, np.shape(a)).astype(np.float32),
        params)
    tnet2 = ref.Unet1D(**NET_KWARGS)
    missing = tnet2.load_state_dict(
        to_torch_state_dict(export_denoiser(perturbed, sd)), strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys
    tnet2.eval()

    B, N, D = 2, 12, 62
    x = rng.normal(0, 1, (B, N, D)).astype(np.float32)
    t = np.array([3, 7], np.int64)
    ctx = rng.normal(0, 1, (B, N, 16)).astype(np.float32)
    ctx_cross = rng.normal(0, 1, (B, 10, 24)).astype(np.float32)
    with torch.no_grad():
        want = tnet2(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(ctx), torch.from_numpy(ctx_cross)).numpy()
    jnet = Unet1D(**{**NET_KWARGS, "dim_mults": tuple(NET_KWARGS["dim_mults"])})
    got = np.asarray(jnet.apply({"params": perturbed}, x, t, ctx, ctx_cross))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_autoencoder_roundtrip_with_stats_and_passthrough():
    import torch

    sys.path.insert(0, os.path.dirname(__file__))
    try:
        from test_convert_autoencoder import _load_ref_foldingnet
    finally:
        sys.path.pop(0)
    from diffuscene_tpu.utils.convert import convert_autoencoder
    from diffuscene_tpu.utils.export import export_autoencoder

    ref = _load_ref_foldingnet()
    torch.manual_seed(0)
    tae = ref.KLAutoEncoder(latent_dim=32, kl_weight=0.001)
    gen = torch.Generator().manual_seed(1)
    for m in tae.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)
            m.num_batches_tracked.fill_(7)  # exercised as template passthrough
    sd = dict(tae.state_dict())

    exported = export_autoencoder(convert_autoencoder(sd), sd)
    _assert_state_dicts_equal(exported, sd)
    assert int(exported["encoder.bn1.num_batches_tracked"]) == 7


def test_feature_extractor_roundtrip_rebakes_frozen_eps():
    sys.path.insert(0, os.path.dirname(__file__))
    try:
        from test_room_mask import _random_resnet18_state_dict
    finally:
        sys.path.pop(0)
    from diffuscene_tpu.utils.convert import convert_feature_extractor
    from diffuscene_tpu.utils.export import export_feature_extractor

    sd = _random_resnet18_state_dict(seed=3, feature_size=32, frozen=True)
    variables = convert_feature_extractor(sd, "resnet18", frozen_source=True)
    exported = export_feature_extractor(variables, sd, "resnet18", frozen_target=True)
    # running_var goes through -eps/+eps in float64; allow one f32 ulp
    _assert_state_dicts_equal(exported, sd, atol=1e-6)


def test_scene_model_roundtrip_with_skipped_text_encoder():
    import torch

    from diffuscene_tpu.utils.convert import convert_scene_model
    from diffuscene_tpu.utils.export import export_scene_model

    ref = _ref_denoiser()
    torch.manual_seed(1)
    tnet = ref.Unet1D(**NET_KWARGS)
    rng = np.random.default_rng(5)
    sd = {f"diffusion.model.{k}": v for k, v in tnet.state_dict().items()}
    # conditioner heads: one SQUARE Linear (pins the transpose-over-identity
    # rule for square 2-D weights) + positional_embedding (identity 2-D)
    sd["fc_instance_condition.0.weight"] = torch.from_numpy(
        rng.normal(0, 1, (16, 16)).astype(np.float32))
    sd["fc_instance_condition.0.bias"] = torch.from_numpy(
        rng.normal(0, 1, (16,)).astype(np.float32))
    sd["fc_instance_condition.2.weight"] = torch.from_numpy(
        rng.normal(0, 1, (16, 16)).astype(np.float32))
    sd["fc_instance_condition.2.bias"] = torch.from_numpy(
        rng.normal(0, 1, (16,)).astype(np.float32))
    sd["positional_embedding"] = torch.from_numpy(
        rng.normal(0, 1, (12, 16)).astype(np.float32))
    # frozen text encoder weights must pass through untouched
    sd["bertmodel.encoder.layer.0.attention.self.query.weight"] = torch.from_numpy(
        rng.normal(0, 1, (8, 8)).astype(np.float32))

    exported = export_scene_model(convert_scene_model(sd), sd)
    _assert_state_dicts_equal(exported, sd)
    # the square Linear really was transposed twice, not passed through once
    assert not np.allclose(
        np.asarray(exported["fc_instance_condition.0.weight"]),
        np.asarray(exported["fc_instance_condition.0.weight"]).T)
