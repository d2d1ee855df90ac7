"""Room-mask conditioning end-to-end: frozen-BN ResNet18 -> fc_room_f ->
condition vector; train step + sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.models.feature_extractors import AlexNet, ResNet18, get_feature_extractor
from diffuscene_tpu.train import Trainer


def test_feature_extractors_shapes():
    for name, cls in [("resnet18", ResNet18), ("alexnet", AlexNet)]:
        net = get_feature_extractor(name, feature_size=32, input_channels=1)
        assert isinstance(net, cls)
        x = jnp.zeros((2, 64, 64, 1))
        variables = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(variables, x)
        assert out.shape == (2, 32)
        # NCHW inputs are accepted for reference parity
        out2 = net.apply(variables, jnp.zeros((2, 1, 64, 64)))
        assert out2.shape == (2, 32)
        # frozen BN: batch_stats exist but are never updated (no mutable
        # pass); the AlexNet variant has no BN (feature_extractors.py:47-68)
        if name == "resnet18":
            assert "batch_stats" in variables


def test_room_mask_conditioned_train_and_sample():
    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=64,
              instanclass_dim=16, seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=True,
        latent_dim=64, instance_condition=True, learnable_embedding=True,
        instance_emb_dim=16, model_mean_type="v", time_num=6, loss_iou=False,
        net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    trainer = Trainer(scene, {"optimizer": "Adam", "lr": 1e-4, "schedule": "step",
                              "lr_step": 1000, "lr_decay": 0.5, "max_grad_norm": 10.0})
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 8
    batch = trainer.put_batch({
        "translations": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, 12, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, 12, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, 12, 32)).astype(np.float32),
        "room_layout": (rng.random((B, 64, 64, 1)) > 0.5).astype(np.float32),
    })
    state, m = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    out = jax.jit(lambda p, k, rl: scene.sample(
        p, k, batch_size=B, room_layout=rl, clip_denoised=True))(
        state.params, jax.random.PRNGKey(2), batch["room_layout"])
    assert out.shape == (B, 12, 62)
    assert np.isfinite(np.asarray(out)).all()
    # different masks -> different conditioning -> different samples
    other = jax.jit(lambda p, k, rl: scene.sample(
        p, k, batch_size=B, room_layout=rl, clip_denoised=True))(
        state.params, jax.random.PRNGKey(2), 1.0 - batch["room_layout"])
    assert not np.allclose(np.asarray(out), np.asarray(other))


def _random_resnet18_state_dict(seed=0, feature_size=32, frozen=True):
    """Reference ResNet18 wrapper state_dict (feature_extractors.py:19-44)
    with random weights; frozen=True mimics FrozenBatchNorm2d.freeze
    (running_var has bn.eps=1e-5 baked in, frozen_batchnorm.py:30)."""
    rng = np.random.default_rng(seed)
    sd = {}
    fe = "_feature_extractor"

    def conv(key, cin, cout, k):
        sd[f"{key}.weight"] = rng.normal(
            0, 1.0 / np.sqrt(cin * k * k), (cout, cin, k, k)).astype(np.float32)

    def bn(key, c):
        sd[f"{key}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{key}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{key}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        var = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{key}.running_var"] = var + 1e-5 if frozen else var

    conv(f"{fe}.conv1", 1, 64, 7)
    bn(f"{fe}.bn1", 64)
    feats = (64, 128, 256, 512)
    cin = 64
    for layer, cout in enumerate(feats, start=1):
        for blk in range(2):
            base = f"{fe}.layer{layer}.{blk}"
            conv(f"{base}.conv1", cin if blk == 0 else cout, cout, 3)
            bn(f"{base}.bn1", cout)
            conv(f"{base}.conv2", cout, cout, 3)
            bn(f"{base}.bn2", cout)
            if blk == 0 and layer > 1:
                conv(f"{base}.downsample.0", cin, cout, 1)
                bn(f"{base}.downsample.1", cout)
        cin = cout
    for key, fin, fout in ((f"{fe}.fc.0", 512, 512), (f"{fe}.fc.2", 512, feature_size)):
        sd[f"{key}.weight"] = rng.normal(0, 1.0 / np.sqrt(fin), (fout, fin)).astype(np.float32)
        sd[f"{key}.bias"] = rng.normal(0, 0.05, fout).astype(np.float32)
    return sd


def _torch_resnet18_forward(sd, x, frozen=True):
    """Reference wrapper forward replayed functionally: torchvision resnet18
    with frozen BN (scale = w * rsqrt(running_var), no eps in the forward —
    frozen_batchnorm.py:64-68) and the Sequential(512->512->F) head."""
    import torch
    import torch.nn.functional as F

    fe = "_feature_extractor"

    def fbn(key, y):
        w = torch.from_numpy(sd[f"{key}.weight"])
        b = torch.from_numpy(sd[f"{key}.bias"])
        m = torch.from_numpy(sd[f"{key}.running_mean"])
        v = torch.from_numpy(sd[f"{key}.running_var"])
        if frozen:
            scale = w * v.rsqrt()
        else:
            scale = w * (v + 1e-5).rsqrt()
        return y * scale.reshape(1, -1, 1, 1) + (b - m * scale).reshape(1, -1, 1, 1)

    y = F.conv2d(x, torch.from_numpy(sd[f"{fe}.conv1.weight"]), stride=2, padding=3)
    y = F.relu(fbn(f"{fe}.bn1", y))
    y = F.max_pool2d(y, 3, 2, padding=1)
    for layer in range(1, 5):
        for blk in range(2):
            base = f"{fe}.layer{layer}.{blk}"
            stride = 2 if (layer > 1 and blk == 0) else 1
            r = y
            y2 = F.relu(fbn(f"{base}.bn1", F.conv2d(
                y, torch.from_numpy(sd[f"{base}.conv1.weight"]), stride=stride, padding=1)))
            y2 = fbn(f"{base}.bn2", F.conv2d(
                y2, torch.from_numpy(sd[f"{base}.conv2.weight"]), padding=1))
            if f"{base}.downsample.0.weight" in sd:
                r = fbn(f"{base}.downsample.1", F.conv2d(
                    y, torch.from_numpy(sd[f"{base}.downsample.0.weight"]), stride=stride))
            y = F.relu(y2 + r)
    y = y.mean(dim=(2, 3))
    y = F.relu(F.linear(y, torch.from_numpy(sd[f"{fe}.fc.0.weight"]),
                        torch.from_numpy(sd[f"{fe}.fc.0.bias"])))
    return F.linear(y, torch.from_numpy(sd[f"{fe}.fc.2.weight"]),
                    torch.from_numpy(sd[f"{fe}.fc.2.bias"]))


def test_resnet18_converter_matches_torch_oracle():
    import pytest

    torch = pytest.importorskip("torch")
    from diffuscene_tpu.utils import convert_feature_extractor

    sd = _random_resnet18_state_dict(seed=3, feature_size=32, frozen=True)
    variables = convert_feature_extractor(sd, "resnet18", frozen_source=True)
    net = ResNet18(feature_size=32, input_channels=1)

    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32)
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = _torch_resnet18_forward(
            sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    assert got.shape == want.shape == (2, 32)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_alexnet_converter_matches_torch_oracle():
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from diffuscene_tpu.utils import convert_feature_extractor

    rng = np.random.default_rng(5)
    sd = {}
    fe = "_feature_extractor"
    specs = [(0, 1, 64, 11), (3, 64, 192, 5), (6, 192, 384, 3),
             (8, 384, 256, 3), (10, 256, 256, 3)]
    for idx, cin, cout, k in specs:
        sd[f"{fe}.features.{idx}.weight"] = rng.normal(
            0, 1.0 / np.sqrt(cin * k * k), (cout, cin, k, k)).astype(np.float32)
        sd[f"{fe}.features.{idx}.bias"] = rng.normal(0, 0.05, cout).astype(np.float32)
    sd["_fc.weight"] = rng.normal(0, 1.0 / np.sqrt(9216), (32, 9216)).astype(np.float32)
    sd["_fc.bias"] = rng.normal(0, 0.05, 32).astype(np.float32)

    variables = convert_feature_extractor(sd, "alexnet")
    net = AlexNet(feature_size=32, input_channels=1)
    x = rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32)
    got = np.asarray(net.apply(variables, jnp.asarray(x)))

    # reference AlexNet.forward (feature_extractors.py:63-68)
    with torch.no_grad():
        y = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        pads = {0: 2, 3: 2, 6: 1, 8: 1, 10: 1}
        for idx, cin, cout, k in specs:
            y = F.relu(F.conv2d(y, torch.from_numpy(sd[f"{fe}.features.{idx}.weight"]),
                                torch.from_numpy(sd[f"{fe}.features.{idx}.bias"]),
                                stride=4 if idx == 0 else 1, padding=pads[idx]))
            if idx in (0, 3, 10):
                y = F.max_pool2d(y, 3, 2)
        y = F.adaptive_avg_pool2d(y, (6, 6)).reshape(y.shape[0], -1)
        want = F.linear(y, torch.from_numpy(sd["_fc.weight"]),
                        torch.from_numpy(sd["_fc.bias"])).numpy()
    assert got.shape == want.shape == (2, 32)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
