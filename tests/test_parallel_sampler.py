"""ShardedSampler: 8-virtual-device mesh sampling matches shapes and shards."""
import jax
import numpy as np

from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
from diffuscene_tpu.parallel import ShardedSampler, make_mesh
from diffuscene_tpu.utils import ThroughputMeter


def _tiny_scene(text=False):
    nk = dict(dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
              instanclass_dim=16, seperate_all=True)
    if text:
        nk.update(text_condition=True, text_dim=32)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        text_condition=text, text_glove_embedding=text, text_embed_dim=32,
        model_mean_type="v", time_num=6, net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0))
    return scene, params


def test_sharded_sampler_uncond():
    scene, params = _tiny_scene()
    mesh = make_mesh()
    sampler = ShardedSampler(scene, mesh)
    assert sampler.n_data == 8
    params = sampler.put_params(params)
    meter = ThroughputMeter(items_per_step=16)
    out = sampler.sample(params, jax.random.PRNGKey(1), batch_size=16)
    meter.tick()
    assert out.shape == (16, 12, 62)
    assert np.isfinite(out).all()
    out2 = sampler.sample(params, jax.random.PRNGKey(1), batch_size=16)
    np.testing.assert_array_equal(out, out2)  # deterministic per key


def test_sharded_sampler_text():
    scene, params = _tiny_scene(text=True)
    sampler = ShardedSampler(scene, make_mesh())
    params = sampler.put_params(params)
    text = np.random.default_rng(0).normal(0, 1, (8, 10, 50)).astype(np.float32)
    out = sampler.sample(params, jax.random.PRNGKey(2), batch_size=8, text_emb=text)
    assert out.shape == (8, 12, 62)
    assert np.isfinite(out).all()


def test_sharded_sampler_fused():
    """Fused serving engine under the 8-device sharded sampler: matches the
    plain sharded path to engine tolerance."""
    scene, params = _tiny_scene()
    mesh = make_mesh()
    plain = ShardedSampler(scene, mesh)
    fused = ShardedSampler(scene, mesh, fused=True)
    p = plain.put_params(params)
    out_plain = plain.sample(p, jax.random.PRNGKey(2), batch_size=16)
    out_fused = fused.sample(p, jax.random.PRNGKey(2), batch_size=16)
    assert out_fused.shape == (16, 12, 62)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               atol=5e-3, rtol=1e-2)


def test_sharded_sampler_completion_splice():
    """partial_boxes runs the batch-sharded RePaint completion splice and
    carries the known slots verbatim (diffusion_ddpm.py:447-478); matches the
    unsharded SceneDiffusion.sample chain bit-for-bit at f32."""
    scene, params = _tiny_scene()
    sampler = ShardedSampler(scene, make_mesh())
    sp = sampler.put_params(params)
    partial = np.random.default_rng(1).uniform(-1, 1, (16, 4, 62)).astype(np.float32)
    out = sampler.sample(sp, jax.random.PRNGKey(3), batch_size=16,
                         partial_boxes=partial)
    assert out.shape == (16, 12, 62)
    np.testing.assert_allclose(out[:, :4], partial, atol=1e-5)
    ref = np.asarray(scene.sample(params, jax.random.PRNGKey(3), batch_size=16,
                                  partial_boxes=partial, clip_denoised=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sharded_sampler_arrange_splice():
    """input_boxes runs the batch-sharded rearrangement splice: sizes and
    class/objfeat channels come verbatim from the conditioning scene
    (diffusion_ddpm.py:480-506).  Uses the 5-channel arrange denoiser
    (trans+angle out), like the reference's rearrange config family."""
    nk = dict(dim=32, dim_mults=(1, 1), channels=5, objectness_dim=0,
              class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
              instanclass_dim=16, seperate_all=False, out_dim=5)
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        room_arrange_condition=True, arrange_emb_dim=8,
        model_mean_type="v", time_num=6, net_kwargs=tuple(sorted(nk.items())))
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(0))
    sampler = ShardedSampler(scene, make_mesh())
    sp = sampler.put_params(params)
    boxes = np.random.default_rng(2).uniform(-1, 1, (16, 12, 62)).astype(np.float32)
    out = sampler.sample(sp, jax.random.PRNGKey(4), batch_size=16,
                         input_boxes=boxes)
    assert out.shape == (16, 12, 62)
    np.testing.assert_allclose(out[:, :, 3:6], boxes[:, :, 3:6], atol=1e-5)
    np.testing.assert_allclose(out[:, :, 8:], boxes[:, :, 8:], atol=1e-5)
    assert not np.allclose(out[:, :, :3], boxes[:, :, :3])
