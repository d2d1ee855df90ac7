"""Trainer EMA weights + gradient accumulation (beyond-reference training
features; reference trains raw weights with per-batch updates only,
scripts/train_diffusion.py:221-255)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.train import Trainer
from diffuscene_tpu.train.trainer import ema_or_params


def tiny_scene():
    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0, class_dim=22,
              angle_dim=2, objfeat_dim=32, context_dim=0, instanclass_dim=16,
              seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        model_mean_type="v", time_num=8, loss_separate=True, loss_iou=False,
        net_kwargs=tuple(sorted(nk.items())))
    return SceneDiffusion(cfg)


def make_batch(trainer, B=8, seed=0):
    rng = np.random.default_rng(seed)
    return trainer.put_batch({
        "translations": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, 12, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, 12, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, 12, 32)).astype(np.float32),
    })


BASE_CFG = {"optimizer": "Adam", "lr": 1e-3, "schedule": "step",
            "lr_step": 1000, "lr_decay": 0.5, "max_grad_norm": 10.0}


def test_ema_follows_recursive_formula():
    scene = tiny_scene()
    d = 0.5  # large (1-decay) so the EMA moves measurably in 3 steps
    trainer = Trainer(scene, {**BASE_CFG, "ema_decay": d})
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(trainer)
    key = jax.random.PRNGKey(1)

    def leaf(tree):  # one representative param leaf
        return np.asarray(jax.tree.leaves(tree)[0], np.float64)

    ema_expect = leaf(state.params)  # EMA initialized to params
    np.testing.assert_allclose(leaf(state.ema_params), ema_expect)
    for _ in range(3):
        state, _ = trainer.train_step(state, batch, key)
        p = leaf(state.params)
        ema_expect = d * ema_expect + (1 - d) * p
        np.testing.assert_allclose(leaf(state.ema_params), ema_expect,
                                   rtol=1e-5, atol=1e-7)
    # EMA lags the raw params (they moved; the average must differ)
    assert np.abs(leaf(state.ema_params) - leaf(state.params)).max() > 0


def test_ema_off_keeps_none_and_sampler_helper_falls_back():
    scene = tiny_scene()
    trainer = Trainer(scene, BASE_CFG)
    state = trainer.init_state(jax.random.PRNGKey(0))
    assert state.ema_params is None
    state, _ = trainer.train_step(state, make_batch(trainer), jax.random.PRNGKey(1))
    assert state.ema_params is None
    assert ema_or_params(state) is state.params


def test_ema_checkpoint_roundtrip(tmp_path):
    from diffuscene_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    scene = tiny_scene()
    cfg = {**BASE_CFG, "ema_decay": 0.9}
    trainer = Trainer(scene, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.train_step(state, make_batch(trainer), jax.random.PRNGKey(1))
    want = np.asarray(jax.tree.leaves(state.ema_params)[0])
    save_checkpoint(state, str(tmp_path), epoch=3)

    template = Trainer(scene, cfg).init_state(jax.random.PRNGKey(7))
    restored, epoch = load_checkpoint(template, str(tmp_path))
    assert epoch == 3
    got = np.asarray(jax.tree.leaves(restored.ema_params)[0])
    np.testing.assert_allclose(got, want)
    got_sel = np.asarray(jax.tree.leaves(ema_or_params(restored))[0])
    np.testing.assert_allclose(got_sel, want)


def test_grad_accum_updates_every_k_steps():
    scene = tiny_scene()
    trainer = Trainer(scene, {**BASE_CFG, "grad_accum": 2})
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(trainer)
    key = jax.random.PRNGKey(1)
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()

    state, _ = trainer.train_step(state, batch, key)
    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    np.testing.assert_allclose(p1, p0)  # micro-step 1: grads accumulated only

    state, _ = trainer.train_step(state, batch, key)
    p2 = np.asarray(jax.tree.leaves(state.params)[0])
    assert np.abs(p2 - p0).max() > 0  # micro-step 2: optimizer applied


def test_grad_accum_applies_mean_gradient_sgd_exact():
    """With plain SGD, two accumulated micro-steps must apply exactly
    -lr * mean(g1, g2), where g1/g2 are the micro-batch gradients at the
    (unchanged) initial params and the trainer's own per-step RNG folding
    (optax.MultiSteps semantics)."""
    scene = tiny_scene()
    lr = 1e-2
    cfg = {"optimizer": "SGD", "momentum": 0.0, "lr": lr, "schedule": "step",
           "lr_step": 10**9, "lr_decay": 0.5, "max_grad_norm": 10**9,
           "grad_accum": 2}
    trainer = Trainer(scene, cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    params0 = jax.tree.map(np.asarray, state.params)
    key = jax.random.PRNGKey(1)

    b1 = make_batch(trainer, seed=3)
    b2 = make_batch(trainer, seed=4)

    # trainer path
    state, _ = trainer.train_step(state, b1, key)
    state, _ = trainer.train_step(state, b2, key)
    got = jax.tree.map(np.asarray, state.params)

    # manual path: gradients at params0 with the trainer's fold_in(step)
    def g(batch, step):
        k = jax.random.fold_in(key, step)
        grads = jax.grad(lambda p: trainer.scene.get_loss(p, batch, k)[0])(
            jax.tree.map(jnp.asarray, params0))
        return jax.tree.map(np.asarray, grads)

    g1, g2 = g(b1, 0), g(b2, 1)
    want = jax.tree.map(lambda p, a, b: p - lr * (a + b) / 2.0, params0, g1, g2)
    flat_got = np.concatenate([x.ravel() for x in jax.tree.leaves(got)])
    flat_want = np.concatenate([x.ravel() for x in jax.tree.leaves(want)])
    np.testing.assert_allclose(flat_got, flat_want, rtol=2e-5, atol=1e-7)


def test_ema_with_grad_accum_decays_once_per_real_update():
    """EMA must move only at MultiSteps boundaries, with a SINGLE decay
    application per real optimizer update (not d^k across micro-steps)."""
    scene = tiny_scene()
    d = 0.5
    trainer = Trainer(scene, {**BASE_CFG, "ema_decay": d, "grad_accum": 2})
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = make_batch(trainer)
    key = jax.random.PRNGKey(1)

    def leaf(tree):
        return np.asarray(jax.tree.leaves(tree)[0], np.float64)

    ema0 = leaf(state.ema_params)
    state, _ = trainer.train_step(state, batch, key)  # micro-step: no update
    np.testing.assert_allclose(leaf(state.ema_params), ema0)
    state, _ = trainer.train_step(state, batch, key)  # boundary: update + 1 decay
    p = leaf(state.params)
    np.testing.assert_allclose(leaf(state.ema_params), d * ema0 + (1 - d) * p,
                               rtol=1e-5, atol=1e-7)


def test_train_step_scan_matches_sequential():
    """train_step_scan(k batches) == k sequential train_step calls with the
    same key: identical final params/step, metrics are the per-step mean."""
    scene = tiny_scene()
    key = jax.random.PRNGKey(1)

    t1 = Trainer(scene, BASE_CFG)
    s1 = t1.init_state(jax.random.PRNGKey(0))
    host = []
    for i in range(3):
        rng = np.random.default_rng(10 + i)
        host.append({
            "translations": rng.uniform(-1, 1, (8, 12, 3)).astype(np.float32),
            "sizes": rng.uniform(-1, 1, (8, 12, 3)).astype(np.float32),
            "angles": rng.uniform(-1, 1, (8, 12, 2)).astype(np.float32),
            "class_labels": (rng.integers(0, 2, (8, 12, 22)) * 2 - 1).astype(np.float32),
            "objfeats_32": rng.normal(0, 1, (8, 12, 32)).astype(np.float32),
        })
    seq_metrics = []
    for b in host:
        s1, m = t1.train_step(s1, t1.put_batch(b), key)
        seq_metrics.append(jax.device_get(m))
    p_seq = jax.device_get(s1.params)

    t2 = Trainer(scene, BASE_CFG)
    s2 = t2.init_state(jax.random.PRNGKey(0))
    s2, m_scan = t2.train_step_scan(s2, t2.put_batches(host), key)
    assert int(s2.step) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        jax.device_get(s2.params), p_seq)
    m_scan = jax.device_get(m_scan)
    for k2 in ("loss", "gradnorm"):
        np.testing.assert_allclose(
            m_scan[k2], np.mean([m[k2] for m in seq_metrics]), rtol=1e-5)
    # second call with the same k reuses the compiled program (cache hit)
    assert len(t2._train_scan_cache) == 1
    s2, _ = t2.train_step_scan(s2, t2.put_batches(host), key)
    assert len(t2._train_scan_cache) == 1 and int(s2.step) == 6


def test_train_step_scan_with_ema_and_accum_matches_sequential():
    """The scan path composes with EMA + grad accumulation: scanning 4
    batches equals 4 sequential steps (2 micro-steps per real update, EMA
    decaying once per REAL update in both)."""
    scene = tiny_scene()
    cfg = {**BASE_CFG, "ema_decay": 0.5, "grad_accum": 2}
    key = jax.random.PRNGKey(1)
    host = []
    for i in range(4):
        rng = np.random.default_rng(20 + i)
        host.append({
            "translations": rng.uniform(-1, 1, (8, 12, 3)).astype(np.float32),
            "sizes": rng.uniform(-1, 1, (8, 12, 3)).astype(np.float32),
            "angles": rng.uniform(-1, 1, (8, 12, 2)).astype(np.float32),
            "class_labels": (rng.integers(0, 2, (8, 12, 22)) * 2 - 1).astype(np.float32),
            "objfeats_32": rng.normal(0, 1, (8, 12, 32)).astype(np.float32),
        })

    t1 = Trainer(scene, cfg)
    s1 = t1.init_state(jax.random.PRNGKey(0))
    for b in host:
        s1, _ = t1.train_step(s1, t1.put_batch(b), key)

    t2 = Trainer(scene, cfg)
    s2 = t2.init_state(jax.random.PRNGKey(0))
    s2, _ = t2.train_step_scan(s2, t2.put_batches(host), key)

    assert int(s2.step) == int(s1.step) == 4
    for attr in ("params", "ema_params"):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
            jax.device_get(getattr(s2, attr)), jax.device_get(getattr(s1, attr)))
