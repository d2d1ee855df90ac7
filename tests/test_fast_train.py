"""Round-5 fast-training options: fused clip+Adam (optionally bf16 moments
+ bf16 grads) and the residual-light WSDense standardization VJP.

The fused optimizer must be numerically EQUIVALENT to the reference recipe's
chain (clip_by_global_norm + Adam, networks/__init__.py:15-34) when moments
stay f32; the low-precision variants trade bounded rounding for HBM traffic
(see train/optim.fused_clip_adam and docs/PERFORMANCE.md round-5 table).
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.models.denoiser import WSDense
from diffuscene_tpu.train import Trainer
from diffuscene_tpu.train.optim import f32_global_norm, fused_clip_adam

B, N_OBJ, POINT_DIM = 16, 12, 62


def _tree(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "a": jax.random.normal(k1, (64, 32)),
        "b": {"c": jax.random.normal(k2, (17,)), "d": jax.random.normal(k3, (3, 5, 7))},
    }


def test_fused_clip_adam_matches_optax_chain():
    key = jax.random.PRNGKey(0)
    params = _tree(key)
    sched = lambda step: 1e-3 * (0.9 ** (step // 3))
    ref = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(learning_rate=sched))
    fus = fused_clip_adam(sched, max_grad_norm=10.0)
    s0, s1 = ref.init(params), fus.init(params)
    p0 = params
    p1 = jax.tree.map(lambda x: x, params)
    for i in range(10):
        # every 3rd gradient is large enough to trigger the clip branch
        scale = 40.0 if i % 3 == 0 else 0.1
        g = jax.tree.map(
            lambda p: jax.random.normal(jax.random.fold_in(key, 100 + i), p.shape) * scale,
            p0,
        )
        u0, s0 = ref.update(g, s0, p0)
        p0 = optax.apply_updates(p0, u0)
        u1, s1 = fus.update(g, s1, p1)
        p1 = optax.apply_updates(p1, u1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


def test_fused_clip_adam_bf16_moments_close():
    key = jax.random.PRNGKey(0)
    params = _tree(key)
    sched = lambda step: 1e-3
    ref = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(learning_rate=sched))
    fus = fused_clip_adam(sched, max_grad_norm=10.0, moment_dtype=jnp.bfloat16)
    s0, s1 = ref.init(params), fus.init(params)
    # moments actually stored in bf16
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(s1.mu))
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(s1.nu))
    p0 = params
    p1 = jax.tree.map(lambda x: x, params)
    for i in range(10):
        g = jax.tree.map(
            lambda p: jax.random.normal(jax.random.fold_in(key, 100 + i), p.shape) * 0.1,
            p0,
        )
        u0, s0 = ref.update(g, s0, p0)
        p0 = optax.apply_updates(p0, u0)
        u1, s1 = fus.update(g, s1, p1)
        p1 = optax.apply_updates(p1, u1)
    # drift bounded by a small multiple of the per-step LR after 10 steps
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        assert float(jnp.max(jnp.abs(a - b))) < 5e-4


def test_f32_global_norm_on_bf16_tree():
    g = {"a": jnp.full((1000,), 0.1, jnp.bfloat16)}
    got = float(f32_global_norm(g))
    # optax.global_norm would square/accumulate in bf16; f32 path is exact
    want = float(np.sqrt(1000 * np.float32(jnp.bfloat16(0.1)) ** 2))
    assert abs(got - want) / want < 1e-3


def test_wsdense_fast_vjp_matches_default():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 12, 64), jnp.float32)
    exact = WSDense(96, dtype=jnp.float32)
    fast = WSDense(96, dtype=jnp.float32, fast_vjp=True)
    p = exact.init(key, x)
    y0 = exact.apply(p, x)
    y1 = fast.apply(p, x)
    # forward: identical up to one-pass-variance rounding
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=5e-5)

    g0 = jax.grad(lambda p: jnp.sum(jnp.sin(exact.apply(p, x))))(p)
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(fast.apply(p, x))))(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        ref = max(1.0, float(jnp.max(jnp.abs(a))))
        assert float(jnp.max(jnp.abs(a - b))) / ref < 1e-5

    # bf16 compute: the projection term uses the bf16 standardized kernel
    exact16 = WSDense(96, dtype=jnp.bfloat16)
    fast16 = WSDense(96, dtype=jnp.bfloat16, fast_vjp=True)
    g0 = jax.grad(lambda p: jnp.sum(jnp.sin(exact16.apply(p, x).astype(jnp.float32))))(p)
    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(fast16.apply(p, x).astype(jnp.float32))))(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        ref = max(1.0, float(jnp.max(jnp.abs(a))))
        assert float(jnp.max(jnp.abs(a - b))) / ref < 5e-3


def _tiny_cfg(**net_extra):
    net_kwargs = dict(
        dim=32, dim_mults=(1, 1), channels=POINT_DIM, objectness_dim=0,
        class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
        instanclass_dim=16, seperate_all=True, compute_dtype=jnp.bfloat16,
    )
    net_kwargs.update(net_extra)
    return SceneModelConfig(
        point_dim=POINT_DIM, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=N_OBJ, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", time_num=50, loss_separate=True, loss_iou=False,
        net_kwargs=tuple(sorted(net_kwargs.items())),
    )


def _batch(trainer):
    rng = np.random.default_rng(0)
    return trainer.put_batch({
        "translations": rng.uniform(-1, 1, (B, N_OBJ, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, N_OBJ, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, N_OBJ, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, N_OBJ, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, N_OBJ, 32)).astype(np.float32),
    })


def test_trainer_lowp_step_close_to_baseline():
    """Full low-precision recipe (fused Adam, bf16 moments, bf16 grads,
    fast WS VJP): one step from identical init lands within bf16 rounding
    of the baseline chain's step."""
    key = jax.random.PRNGKey(1)
    tcfg_base = {"optimizer": "Adam", "lr": 2e-4, "max_grad_norm": 10.0}
    tcfg_lowp = dict(tcfg_base, fused_adam=True,
                     adam_moment_dtype="bfloat16", grads_dtype="bfloat16")

    results = {}
    for name, cfg, tcfg in (
        ("base", _tiny_cfg(), tcfg_base),
        ("lowp", _tiny_cfg(ws_fast_vjp=True), tcfg_lowp),
    ):
        scene = SceneDiffusion(cfg)
        trainer = Trainer(scene, tcfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _batch(trainer)
        for _ in range(3):
            state, metrics = trainer.train_step(state, batch, key)
        results[name] = (
            float(jax.device_get(metrics["loss"])),
            jax.device_get(state.params),
        )
    loss_b, params_b = results["base"]
    loss_l, params_l = results["lowp"]
    assert np.isfinite(loss_l)
    assert abs(loss_l - loss_b) <= 2e-2 * max(1.0, abs(loss_b))
    lr = 2e-4
    for a, b in zip(jax.tree.leaves(params_b), jax.tree.leaves(params_l)):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        # 3 Adam steps bound elementwise updates by ~3*lr each path
        assert d.max() <= 6.5 * lr


def test_trainer_lowp_moment_dtypes():
    scene = SceneDiffusion(_tiny_cfg())
    trainer = Trainer(scene, {"optimizer": "Adam", "lr": 2e-4,
                              "max_grad_norm": 10.0, "fused_adam": True,
                              "adam_moment_dtype": "bfloat16",
                              "grads_dtype": "bfloat16"})
    state = trainer.init_state(jax.random.PRNGKey(0))
    # chain state: (masked-frozen-stats, fused adam)
    fused_state = state.opt_state[1]
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(fused_state.mu))
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(fused_state.nu))
    # params stay f32 masters
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.params))


def test_ema_bf16_storage_tracks_f32_ema():
    """training.ema_dtype=bfloat16: EMA stored bf16 (half the EMA-pass HBM
    traffic), update accumulated in f32 — must track the f32 EMA within
    bf16 rounding, and samplers get it via ema_or_params as usual."""
    from diffuscene_tpu.train.trainer import ema_or_params

    key = jax.random.PRNGKey(1)
    base = {"optimizer": "Adam", "lr": 2e-3, "max_grad_norm": 10.0,
            "ema_decay": 0.9}
    states = {}
    for name, extra in (("f32", {}), ("bf16", {"ema_dtype": "bfloat16"})):
        scene = SceneDiffusion(_tiny_cfg())
        trainer = Trainer(scene, dict(base, **extra))
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _batch(trainer)
        for _ in range(3):
            state, _ = trainer.train_step(state, batch, key)
        states[name] = state

    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree.leaves(states["bf16"].ema_params))
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(states["f32"].ema_params))
    for a, b in zip(jax.tree.leaves(ema_or_params(states["f32"])),
                    jax.tree.leaves(ema_or_params(states["bf16"]))):
        af = np.asarray(a, np.float32)
        bf = np.asarray(b, np.float32)
        # each bf16 store rounds by up to ~|e|*2^-9; the init cast + 3
        # update stores accumulate to a few ulps -> 2^-6 relative bound
        tol = np.maximum(np.abs(af) * 2 ** -6, 1e-6)
        assert (np.abs(af - bf) <= tol + 1e-5).all()


def test_b512_config_wires_fast_train_keys():
    """The shipped b512 TPU config's training keys reach the fused
    low-precision optimizer and the net flags reach Unet1D."""
    import os

    import yaml

    from diffuscene_tpu.models import SceneModelConfig
    from diffuscene_tpu.models.scene_model import build_unet1d
    from diffuscene_tpu.train.optim import FusedClipAdamState, optimizer_factory

    path = os.path.join(os.path.dirname(__file__), "..", "configs", "uncond",
                        "diffusion_bedrooms_instancond_lat32_v_b512_tpu.yaml")
    cfg = yaml.safe_load(open(path))
    tcfg = cfg["training"]
    assert tcfg["batch_size"] == 512 and tcfg["fused_adam"]
    tx = optimizer_factory(tcfg, steps_per_epoch=500)
    state = tx.init({"w": jnp.zeros((4, 4))})
    assert isinstance(state, FusedClipAdamState)
    assert jax.tree.leaves(state.mu)[0].dtype == jnp.bfloat16
    net = build_unet1d(SceneModelConfig.from_config(cfg["network"]))
    assert net.ws_fast_vjp and not net.exact_gelu
    assert net.compute_dtype == jnp.bfloat16


def test_trainer_lowp_scan_matches_single_steps():
    """train_step_scan with the low-precision recipe stays consistent with
    the single-step path (same key folding, same state threading)."""
    tcfg = {"optimizer": "Adam", "lr": 2e-4, "max_grad_norm": 10.0,
            "fused_adam": True, "adam_moment_dtype": "bfloat16",
            "grads_dtype": "bfloat16"}
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    host = [{
        "translations": rng.uniform(-1, 1, (B, N_OBJ, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, N_OBJ, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, N_OBJ, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, N_OBJ, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, N_OBJ, 32)).astype(np.float32),
    } for _ in range(4)]

    scene = SceneDiffusion(_tiny_cfg())
    tr = Trainer(scene, tcfg)
    s1 = tr.init_state(jax.random.PRNGKey(0))
    for b in host:
        s1, m1 = tr.train_step(s1, tr.put_batch(b), key)

    s2 = tr.init_state(jax.random.PRNGKey(0))
    s2, m2 = tr.train_step_scan(s2, tr.put_batches(host), key)

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)
