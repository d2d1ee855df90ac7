"""Pure-JAX InceptionV3 / VGG16 backbones: loader + numerics tests.

torchvision is not importable in this image, so architecture numerics are
locked against hand-written torch.nn.functional forwards over the SAME spec
tables and random state_dicts — this catches HWIO transposes, BN folding,
padding order, pooling semantics (count_include_pad), and the NCHW flatten
order in VGG's classifier, i.e. everything that would make locally shipped
torchvision weights produce wrong features.
"""
import os

import numpy as np
import pytest

from diffuscene_tpu.eval.backbones import (
    INCEPTION_CONVS, VGG16_CONVS, VGG16_FCS, VGG16_POOL_AFTER,
    inception_v3_pool3, load_inception_params, load_vgg16_params,
    random_inception_state_dict, random_vgg16_state_dict, vgg16_fc2,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _tconv_bn(sd, name, x, stride=1, pad=(0, 0)):
    w = torch.from_numpy(sd[f"{name}.conv.weight"])
    y = F.conv2d(x, w, stride=stride, padding=pad)
    y = F.batch_norm(
        y, torch.from_numpy(sd[f"{name}.bn.running_mean"]),
        torch.from_numpy(sd[f"{name}.bn.running_var"]),
        torch.from_numpy(sd[f"{name}.bn.weight"]),
        torch.from_numpy(sd[f"{name}.bn.bias"]), training=False, eps=1e-3)
    return F.relu(y)


def _torch_inception_pool3(sd, x, fid=False):
    """Inception3._forward replayed with functional ops (NCHW).

    ``fid=False``: plain torchvision semantics (avg pools include padding).
    ``fid=True``: the canonical FID network (pytorch-fid FIDInceptionA/C/E_1
    use count_include_pad=False; FIDInceptionE_2's pool branch is MAX).
    """
    def c(name, x, stride=1, pad=(0, 0)):
        return _tconv_bn(sd, name, x, stride, pad)

    def apool(x):
        return F.avg_pool2d(x, 3, 1, 1, count_include_pad=not fid)

    def pool7c(x):
        return F.max_pool2d(x, 3, 1, 1) if fid else apool(x)

    x = c("Conv2d_1a_3x3", x, 2)
    x = c("Conv2d_2a_3x3", x)
    x = c("Conv2d_2b_3x3", x, pad=(1, 1))
    x = F.max_pool2d(x, 3, 2)
    x = c("Conv2d_3b_1x1", x)
    x = c("Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)

    def block_a(p, x):
        b1 = c(f"{p}.branch1x1", x)
        b5 = c(f"{p}.branch5x5_2", c(f"{p}.branch5x5_1", x), pad=(2, 2))
        b3 = c(f"{p}.branch3x3dbl_3",
               c(f"{p}.branch3x3dbl_2", c(f"{p}.branch3x3dbl_1", x),
                 pad=(1, 1)), pad=(1, 1))
        bp = c(f"{p}.branch_pool", apool(x))
        return torch.cat([b1, b5, b3, bp], dim=1)

    for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = block_a(m, x)

    b3 = c("Mixed_6a.branch3x3", x, stride=2)
    bd = c("Mixed_6a.branch3x3dbl_3",
           c("Mixed_6a.branch3x3dbl_2", c("Mixed_6a.branch3x3dbl_1", x),
             pad=(1, 1)), stride=2)
    x = torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], dim=1)

    def block_c(p, x):
        b1 = c(f"{p}.branch1x1", x)
        b7 = c(f"{p}.branch7x7_3",
               c(f"{p}.branch7x7_2", c(f"{p}.branch7x7_1", x),
                 pad=(0, 3)), pad=(3, 0))
        bd = x
        for s, pad in [("1", (0, 0)), ("2", (3, 0)), ("3", (0, 3)),
                       ("4", (3, 0)), ("5", (0, 3))]:
            bd = c(f"{p}.branch7x7dbl_{s}", bd, pad=pad)
        bp = c(f"{p}.branch_pool", apool(x))
        return torch.cat([b1, b7, bd, bp], dim=1)

    for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = block_c(m, x)

    b3 = c("Mixed_7a.branch3x3_2", c("Mixed_7a.branch3x3_1", x), stride=2)
    b7 = c("Mixed_7a.branch7x7x3_1", x)
    b7 = c("Mixed_7a.branch7x7x3_2", b7, pad=(0, 3))
    b7 = c("Mixed_7a.branch7x7x3_3", b7, pad=(3, 0))
    b7 = c("Mixed_7a.branch7x7x3_4", b7, stride=2)
    x = torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], dim=1)

    def block_e(p, x, pool):
        b1 = c(f"{p}.branch1x1", x)
        b3 = c(f"{p}.branch3x3_1", x)
        b3 = torch.cat([c(f"{p}.branch3x3_2a", b3, pad=(0, 1)),
                        c(f"{p}.branch3x3_2b", b3, pad=(1, 0))], dim=1)
        bd = c(f"{p}.branch3x3dbl_2", c(f"{p}.branch3x3dbl_1", x), pad=(1, 1))
        bd = torch.cat([c(f"{p}.branch3x3dbl_3a", bd, pad=(0, 1)),
                        c(f"{p}.branch3x3dbl_3b", bd, pad=(1, 0))], dim=1)
        bp = c(f"{p}.branch_pool", pool(x))
        return torch.cat([b1, b3, bd, bp], dim=1)

    x = block_e("Mixed_7b", x, apool)
    x = block_e("Mixed_7c", x, pool7c)
    return x.mean(dim=(2, 3))


def _torch_vgg16_fc2(sd, x):
    for name, *_ in VGG16_CONVS:
        x = F.relu(F.conv2d(x, torch.from_numpy(sd[f"{name}.weight"]),
                            torch.from_numpy(sd[f"{name}.bias"]), padding=1))
        if name in VGG16_POOL_AFTER:
            x = F.max_pool2d(x, 2, 2)
    x = x.reshape(x.shape[0], -1)  # NCHW flatten, 25088
    x = F.relu(F.linear(x, torch.from_numpy(sd["classifier.0.weight"]),
                        torch.from_numpy(sd["classifier.0.bias"])))
    return F.linear(x, torch.from_numpy(sd["classifier.3.weight"]),
                    torch.from_numpy(sd["classifier.3.bias"]))


def _save_npz(tmp_path, sd, name):
    path = os.path.join(tmp_path, name)
    np.savez(path, **sd)
    return path + ".npz" if not path.endswith(".npz") else path


@pytest.mark.parametrize("fid_pools", [False, True])
def test_inception_matches_torch_functional(tmp_path, fid_pools):
    """fid_pools=True locks the canonical FID network's pooling (pytorch-fid
    FIDInceptionA/C/E_1: count_include_pad=False; E_2: max pool) against an
    independent torch oracle; False locks plain torchvision semantics."""
    sd = random_inception_state_dict(0)
    params = load_inception_params(_save_npz(str(tmp_path), sd, "inc.npz"))
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (1, 147, 147, 3)).astype(np.float32)

    got = np.asarray(inception_v3_pool3(params, x, fid_pools=fid_pools))
    with torch.no_grad():
        want = _torch_inception_pool3(
            sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            fid=fid_pools).numpy()
    assert got.shape == (1, 2048)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_inception_fid_vs_torchvision_pools_differ(tmp_path):
    """The two published networks genuinely differ — guard against the
    variants silently collapsing into one."""
    sd = random_inception_state_dict(0)
    params = load_inception_params(_save_npz(str(tmp_path), sd, "inc2.npz"))
    x = np.random.default_rng(2).uniform(-1, 1, (1, 147, 147, 3)).astype(np.float32)
    a = np.asarray(inception_v3_pool3(params, x, fid_pools=True))
    b = np.asarray(inception_v3_pool3(params, x, fid_pools=False))
    assert np.abs(a - b).max() > 1e-4


def test_inception_transform_input_matches_torchvision_formula(tmp_path):
    sd = random_inception_state_dict(0)
    params = load_inception_params(_save_npz(str(tmp_path), sd, "inc3.npz"))
    x = np.random.default_rng(3).uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
    got = np.asarray(inception_v3_pool3(params, x, fid_pools=False,
                                        transform_input=True))
    # torchvision Inception3._transform_input applied host-side, then plain
    tx = np.stack([
        x[..., 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
        x[..., 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
        x[..., 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5,
    ], axis=-1)
    want = np.asarray(inception_v3_pool3(params, tx, fid_pools=False))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_vgg16_matches_torch_functional(tmp_path):
    sd = random_vgg16_state_dict(0)
    params = load_vgg16_params(_save_npz(str(tmp_path), sd, "vgg.npz"))
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32)

    got = np.asarray(vgg16_fc2(params, x))
    with torch.no_grad():
        want = _torch_vgg16_fc2(
            sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    assert got.shape == (2, 4096)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-4)


def test_extractors_end_to_end(tmp_path):
    from diffuscene_tpu.eval.fid import JaxInceptionFeatures, JaxVGG16Features

    inc_path = _save_npz(str(tmp_path), random_inception_state_dict(0), "i.npz")
    vgg_path = _save_npz(str(tmp_path), random_vgg16_state_dict(0), "v.npz")
    images = np.random.default_rng(0).integers(
        0, 256, (5, 64, 64, 3)).astype(np.uint8)

    inc = JaxInceptionFeatures(inc_path, batch_size=4)  # forces the pad path
    f1 = inc(images)
    assert f1.shape == (5, 2048) and np.isfinite(f1).all()
    np.testing.assert_allclose(f1, inc(images), atol=0)  # deterministic

    vgg = JaxVGG16Features(vgg_path, batch_size=4)
    f2 = vgg(images)
    assert f2.shape == (5, 4096) and np.isfinite(f2).all()


def test_missing_weights_raise_loudly():
    from diffuscene_tpu.eval.fid import JaxInceptionFeatures, JaxVGG16Features

    with pytest.raises(FileNotFoundError, match="refusing"):
        JaxInceptionFeatures("/nonexistent/weights.pth")
    with pytest.raises(FileNotFoundError):
        JaxVGG16Features(None)


def test_fid_cli_errors_without_inception_weights(tmp_path):
    from diffuscene_tpu.cli import compute_fid_scores

    with pytest.raises(FileNotFoundError):
        compute_fid_scores.main([str(tmp_path), str(tmp_path),
                                 "--features", "inception"])


def test_spec_tables_consistent():
    """Every concat's input channel count must match the spec chain."""
    outs = {}
    for name, cin, cout, *_ in INCEPTION_CONVS:
        outs[name] = (cin, cout)
    # InceptionA output = 64 + 64 + 96 + pool
    assert outs["Mixed_5c.branch1x1"][0] == 64 + 64 + 96 + 32  # 5b out
    assert outs["Mixed_5d.branch1x1"][0] == 64 + 64 + 96 + 64  # 5c out
    assert outs["Mixed_6a.branch3x3"][0] == 288
    assert outs["Mixed_6b.branch1x1"][0] == 384 + 96 + 288  # 768
    assert outs["Mixed_7a.branch3x3_1"][0] == 768
    assert outs["Mixed_7b.branch1x1"][0] == 320 + 192 + 768  # 1280
    assert outs["Mixed_7c.branch1x1"][0] == 320 + 768 + 768 + 192  # 2048
    total_fc_in = VGG16_FCS[0][1]
    assert total_fc_in == 512 * 7 * 7
