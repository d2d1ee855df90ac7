"""Task-level sampling APIs: completion preserves partial slots; arrange
preserves conditioned channels (the /verify task-API surface, as a test)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig


def test_completion_preserves_partials():
    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0, class_dim=22,
              angle_dim=2, objfeat_dim=32, context_dim=0, instanclass_dim=16,
              seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        room_partial_condition=True, partial_num_points=3, partial_emb_dim=8,
        model_mean_type="v", time_num=8, net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0))
    partial = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 3, 62)), jnp.float32)
    out = jax.jit(lambda p, k: scene.sample(p, k, batch_size=2, partial_boxes=partial))(
        params, jax.random.PRNGKey(1))
    assert out.shape == (2, 12, 62)
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(partial), atol=1e-6)


def test_arrange_preserves_conditioned_channels():
    nk = dict(dim=32, dim_mults=(1, 1), channels=5, objectness_dim=0, class_dim=22,
              angle_dim=2, objfeat_dim=32, context_dim=0, instanclass_dim=16,
              seperate_all=False, out_dim=5)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        room_arrange_condition=True, arrange_emb_dim=8,
        model_mean_type="v", time_num=8, net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0))
    boxes = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 12, 62)), jnp.float32)
    out = jax.jit(lambda p, k: scene.sample(p, k, batch_size=2, input_boxes=boxes))(
        params, jax.random.PRNGKey(2))
    assert out.shape == (2, 12, 62)
    # sizes + class/objfeats come straight from the conditioning boxes
    np.testing.assert_allclose(np.asarray(out[:, :, 3:6]), np.asarray(boxes[:, :, 3:6]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, :, 8:]), np.asarray(boxes[:, :, 8:]), atol=1e-6)
    # translations/angles are re-sampled (differ from input)
    assert not np.allclose(np.asarray(out[:, :, :3]), np.asarray(boxes[:, :, :3]))


def test_fast_samplers_rejected_for_splice_tasks():
    """ddim/dpm cannot silently degrade to the ancestral splice chains."""
    import pytest

    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0, class_dim=22,
              angle_dim=2, objfeat_dim=32, context_dim=0, instanclass_dim=16,
              seperate_all=True)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        room_partial_condition=True, partial_num_points=3, partial_emb_dim=8,
        model_mean_type="v", time_num=8, net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0))
    partial = jnp.zeros((2, 3, 62), jnp.float32)
    with pytest.raises(ValueError, match="ancestral"):
        scene.sample(params, jax.random.PRNGKey(1), batch_size=2,
                     partial_boxes=partial, dpm=True)
    with pytest.raises(ValueError, match="ancestral"):
        scene.sample(params, jax.random.PRNGKey(1), batch_size=2,
                     input_boxes=jnp.zeros((2, 12, 62), jnp.float32), ddim=True)
