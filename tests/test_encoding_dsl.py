"""encoding_type micro-DSL parsing (threed_front_dataset.py:942-1072 tokens)."""
import numpy as np
import pytest

from diffuscene_tpu.data.encoding import Bounds, build_encoding


def _bounds():
    return Bounds(
        translations=(np.zeros(3), np.ones(3)),
        sizes=(np.zeros(3), np.ones(3)),
        angles=(np.array(-np.pi), np.array(np.pi)),
    )


LABELS = [f"c{i}" for i in range(4)] + ["start", "end"]


def test_token_parsing():
    e = build_encoding("cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm",
                       _bounds(), 12, LABELS, {})
    assert e.cosin_angle and e.objfeats_norm and e.lat32 and e.use_objfeats
    assert e.permute and not e.eval_mode and e.mode == "diffusion"

    e = build_encoding("cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm_no_prm",
                       _bounds(), 12, LABELS, {})
    assert not e.permute

    e = build_encoding("cached_diffusion_textfix_cosin_angle_objfeatsnorm_lat32_wocm",
                       _bounds(), 12, LABELS, {})
    assert e.add_text and e.text_eval

    e = build_encoding("cached_diffusion_text_cosin_angle_objfeatsnorm_lat32_wocm",
                       _bounds(), 12, LABELS, {})
    assert e.add_text and not e.text_eval

    # eval: scaled output only, no permutation/padding
    e = build_encoding("cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm_eval",
                       _bounds(), 12, LABELS, {})
    assert e.eval_mode and not e.permute

    e = build_encoding("cached_autoregressivewocm", _bounds(), 12, LABELS, {})
    assert e.mode == "autoregressive_wocm"

    with pytest.raises(NotImplementedError):
        build_encoding("cached_mystery", _bounds(), 12, LABELS, {})


def test_eval_mode_returns_scaled_unpadded():
    e = build_encoding("cached_diffusion_cosin_angle_wocm_eval", _bounds(), 12, LABELS, {})
    s = {
        "translations": np.full((3, 3), 0.5, np.float32),
        "sizes": np.full((3, 3), 0.5, np.float32),
        "angles": np.zeros((3, 1), np.float32),
        "class_labels": np.eye(6, dtype=np.float32)[[0, 1, 2]],
    }
    out = e(s)
    assert out["translations"].shape == (3, 3)  # no padding
    np.testing.assert_allclose(out["translations"], 0.0, atol=1e-6)  # scaled to [-1,1]
    assert out["angles"].shape == (3, 2)  # cos/sin
