"""Torch->Flax converter parity: convert a randomly initialized reference
Unet1D state_dict and check the Flax denoiser reproduces the torch forward
to float32 tolerance.  Skipped when the reference checkout isn't present.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/scene_synthesis/networks/denoise_net.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF), reason="reference checkout not available"
)


def _load_ref_denoise():
    import importlib.machinery
    import importlib.util

    # the reference file has dead tkinter imports (denoise_net.py:6-7)
    tk = types.ModuleType("tkinter")
    tk.__spec__ = importlib.machinery.ModuleSpec("tkinter", None)
    tk.__path__ = []
    tk.W = None
    for sub, attrs in [("messagebox", {"NO": None}), ("tix", {"Tree": None})]:
        mod = types.ModuleType("tkinter." + sub)
        mod.__spec__ = importlib.machinery.ModuleSpec("tkinter." + sub, None)
        for a, v in attrs.items():
            setattr(mod, a, v)
        sys.modules.setdefault("tkinter." + sub, mod)
    sys.modules.setdefault("tkinter", tk)
    spec = importlib.util.spec_from_file_location("ref_denoise", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.parametrize("text_condition,dim,mults", [
    (False, 32, [1, 1]),
    (True, 32, [1, 1]),
    (False, 64, [1, 1, 1, 1]),  # the shipped 4-level architecture
])
def test_unet1d_conversion_matches_torch(text_condition, dim, mults):
    import torch

    import jax
    import jax.numpy as jnp
    from diffuscene_tpu.models import Unet1D
    from diffuscene_tpu.utils import convert_denoiser

    ref = _load_ref_denoise()
    kwargs = dict(
        dim=dim, dim_mults=list(mults), channels=62, objectness_dim=0, class_dim=22,
        translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
        context_dim=0, instanclass_dim=16, seperate_all=True,
        text_condition=text_condition, text_dim=24,
    )
    tnet = ref.Unet1D(**kwargs)
    tnet.eval()
    sd = {k: v for k, v in tnet.state_dict().items()}
    params = convert_denoiser(sd)

    jnet = Unet1D(
        dim=dim, dim_mults=tuple(mults), channels=62, objectness_dim=0, class_dim=22,
        translation_dim=3, size_dim=3, angle_dim=2, objfeat_dim=32,
        context_dim=0, instanclass_dim=16, seperate_all=True,
        text_condition=text_condition, text_dim=24,
    )

    B, N, D = 2, 12, 62
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (B, N, D)).astype(np.float32)
    t = np.array([3, 7], np.int64)
    ctx = rng.normal(0, 1, (B, N, 16)).astype(np.float32)
    ctx_cross = rng.normal(0, 1, (B, 10, 24)).astype(np.float32) if text_condition else None

    with torch.no_grad():
        targs = [torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)]
        if text_condition:
            targs.append(torch.from_numpy(ctx_cross))
        # reference forward takes (B, N, C) and permutes internally
        tout = tnet(*targs).numpy()
    # torch returns (B, C, N); ours is (B, N, C)
    tout = np.transpose(tout, (0, 2, 1)) if tout.shape[1] == D else tout

    jout = jnet.apply(
        {"params": params},
        jnp.asarray(x), jnp.asarray(t.astype(np.int32)), jnp.asarray(ctx),
        jnp.asarray(ctx_cross) if text_condition else None,
    )
    np.testing.assert_allclose(np.asarray(jout), tout, atol=2e-4, rtol=1e-3)


def test_scene_model_key_mapping():
    """Conditioner key mapping without the reference: fabricate a state_dict."""
    from diffuscene_tpu.utils import convert_scene_model

    sd = {
        "positional_embedding": np.zeros((12, 16), np.float32),
        "fc_room_f.weight": np.zeros((8, 64), np.float32),
        "fc_room_f.bias": np.zeros((8,), np.float32),
        "fc_partial_condition.0.weight": np.zeros((4, 62), np.float32),
        "fc_partial_condition.2.weight": np.zeros((4, 4), np.float32),
        "bertmodel.encoder.layer.0.attention.self.query.weight": np.zeros((2, 2)),
        "diffusion.model.init_conv.weight": np.zeros((32, 32, 1), np.float32),
        "diffusion.model.init_conv.bias": np.zeros((32,), np.float32),
    }
    out = convert_scene_model(sd)
    cond = out["params"]["conditioner"]
    assert cond["positional_embedding"].shape == (12, 16)
    assert cond["fc_room_f"]["kernel"].shape == (64, 8)
    assert cond["fc_partial_0"]["kernel"].shape == (62, 4)
    assert out["params"]["denoiser"]["init_conv"]["kernel"].shape == (32, 32)
