"""Denoiser tests: shapes, permutation equivariance, conditioning."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuscene_tpu.models import Unet1D

BEDROOM_KW = dict(
    dim=64,  # small for test speed; structure identical to dim=512 config
    dim_mults=(1, 1, 1, 1),
    channels=62,
    objectness_dim=0,
    class_dim=22,
    translation_dim=3,
    size_dim=3,
    angle_dim=2,
    objfeat_dim=32,
    context_dim=0,
    instanclass_dim=128,
    seperate_all=True,
)


class _JittedNet:
    def __init__(self, net):
        self._apply = jax.jit(net.apply)

    def apply(self, params, *args):
        return self._apply(params, *args)


@pytest.fixture(scope="module")
def net_and_params():
    net = Unet1D(**BEDROOM_KW)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 12, 62))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 12, 128))
    params = jax.jit(net.init)(key, x, t, ctx)
    return _JittedNet(net), params


def test_output_shape(net_and_params):
    net, params = net_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 12, 62))
    t = jnp.array([0, 500, 999])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (3, 12, 128))
    out = net.apply(params, x, t, ctx)
    assert out.shape == (3, 12, 62)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_permutation_equivariance(net_and_params):
    """All ops are per-object or set-attention, so permuting object slots must
    permute the output identically (given a permuted condition).  Guaranteed by
    construction in the reference (k=1 convs, denoise_net.py:397)."""
    net, params = net_and_params
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 12, 62))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (2, 12, 128))
    t = jnp.array([7, 123])
    perm = np.random.RandomState(0).permutation(12)

    out = net.apply(params, x, t, ctx)
    out_perm = net.apply(params, x[:, perm], t, ctx[:, perm])
    np.testing.assert_allclose(np.asarray(out)[:, perm], np.asarray(out_perm), atol=2e-5)


def test_time_conditioning_matters(net_and_params):
    net, params = net_and_params
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 12, 62))
    ctx = jnp.zeros((1, 12, 128))
    o1 = net.apply(params, x, jnp.array([0]), ctx)
    o2 = net.apply(params, x, jnp.array([999]), ctx)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4


def test_context_conditioning_matters(net_and_params):
    net, params = net_and_params
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 12, 62))
    t = jnp.array([100])
    c1 = jnp.zeros((1, 12, 128))
    c2 = jnp.ones((1, 12, 128))
    o1 = net.apply(params, x, t, c1)
    o2 = net.apply(params, x, t, c2)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4


def test_text_cross_attention():
    kw = dict(BEDROOM_KW)
    kw["text_condition"] = True
    kw["text_dim"] = 32
    net = Unet1D(**kw)
    x = jnp.zeros((2, 12, 62))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 12, 128))
    txt = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    params = jax.jit(net.init)(jax.random.PRNGKey(1), x, t, ctx, txt)
    apply = jax.jit(net.apply)
    out = apply(params, x, t, ctx, txt)
    assert out.shape == (2, 12, 62)
    out2 = apply(params, x, t, ctx, txt * 2.0)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_arrange_mode_5_channels():
    """Rearrange config: channels = trans+angle = 5 (rearrange yaml)."""
    kw = dict(
        dim=32, dim_mults=(1, 1, 1, 1), channels=5,
        objectness_dim=0, class_dim=0, translation_dim=3, size_dim=0,
        angle_dim=2, objfeat_dim=0, context_dim=0, instanclass_dim=16,
        seperate_all=False,
    )
    net = Unet1D(**kw)
    x = jnp.zeros((2, 12, 5))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 12, 16))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, t, ctx)
    out = jax.jit(net.apply)(params, x, t, ctx)
    assert out.shape == (2, 12, 5)


def test_param_count_bedroom_config():
    """Full-size bedroom config builds and has a plausible parameter count."""
    net = Unet1D(dim=512, dim_mults=(1, 1, 1, 1), channels=62, objectness_dim=0,
                 class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
                 instanclass_dim=128, seperate_all=True)
    x = jnp.zeros((1, 12, 62))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 12, 128))
    shapes = jax.eval_shape(net.init, jax.random.PRNGKey(0), x, t, ctx)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes))
    # reference torch model is in the tens of millions of params
    assert 20e6 < n < 120e6, n


def test_seg_softmax_heads_matches_4d_reshape():
    """The flat-layout per-head softmax (segment max + block-diagonal denom,
    denoiser.seg_softmax_heads) must equal reshaping to (…, H, D) and
    softmaxing over D — including when one head's logits dwarf another's
    (the case a global row max would underflow)."""
    from diffuscene_tpu.models.denoiser import seg_softmax_heads

    heads, dim_head = 4, 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 5, heads * dim_head))
    # head 0 logits huge, head 2 logits tiny: per-segment max must protect both
    x = x.at[..., :dim_head].add(200.0).at[..., 2 * dim_head : 3 * dim_head].add(-200.0)

    got = seg_softmax_heads(x, heads, dim_head)
    want = jax.nn.softmax(x.reshape(3, 5, heads, dim_head), axis=-1).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.reshape(3, 5, heads, dim_head).sum(-1)), 1.0, atol=1e-5
    )


def test_flat_attention_matches_4d_head_form(net_and_params):
    """LinearAttention in flat (B, N, H*D) layout with the block-diagonal head
    mask must equal the textbook 4-D head formulation of the same math
    (reference denoise_net.py:208-235)."""
    from diffuscene_tpu.models.denoiser import LinearAttention

    net = LinearAttention(heads=4, dim_head=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 64))
    params = net.init(jax.random.PRNGKey(2), x)
    got = net.apply(params, x)

    # independent 4-D reimplementation using the same weights
    p = params["params"]
    B, N, C = x.shape
    H, D = 4, 8
    qkv = x @ p["to_qkv"]["kernel"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda a: a.reshape(B, N, H, D).transpose(0, 2, 3, 1)  # (B,H,D,N)
    q, k, v = split(q), split(k), split(v)
    q = jax.nn.softmax(q, axis=-2) * D**-0.5
    k = jax.nn.softmax(k, axis=-1)
    ctx = jnp.einsum("bhdn,bhen->bhde", k, v)
    out = jnp.einsum("bhde,bhdn->bhen", ctx, q)
    out = out.transpose(0, 3, 1, 2).reshape(B, N, H * D)
    out = out @ p["to_out"]["kernel"] + p["to_out"]["bias"]
    mean = out.mean(-1, keepdims=True)
    var = jnp.maximum((out * out).mean(-1, keepdims=True) - mean * mean, 0.0)
    want = (out - mean) * jax.lax.rsqrt(var + 1e-5) * p["out_norm"]["g"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_full_attention_flat_matches_4d_head_form():
    """Full softmax Attention (mid-block) flat head layout vs the 4-D form
    (reference denoise_net.py:237-259)."""
    from diffuscene_tpu.models.denoiser import Attention

    net = Attention(heads=4, dim_head=8)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 64))
    params = net.init(jax.random.PRNGKey(4), x)
    got = net.apply(params, x)

    p = params["params"]
    B, N, C = x.shape
    H, D = 4, 8
    qkv = x @ p["to_qkv"]["kernel"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda a: a.reshape(B, N, H, D)
    q, k, v = split(q), split(k), split(v)
    sim = jnp.einsum("bihd,bjhd->bhij", q * D**-0.5, k)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, N, H * D)
    want = out @ p["to_out"]["kernel"] + p["to_out"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_exact_gelu_flag():
    """exact_gelu=False (tanh approximation, the fast-train option) must keep
    the same param tree and stay within the approximation's known error."""
    kw_exact = dict(BEDROOM_KW)
    kw_tanh = dict(BEDROOM_KW, exact_gelu=False)
    net_e, net_t = Unet1D(**kw_exact), Unet1D(**kw_tanh)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 12, 62))
    t = jnp.array([3, 700])
    ctx = jax.random.normal(jax.random.PRNGKey(8), (2, 12, 128))
    params = jax.jit(net_e.init)(jax.random.PRNGKey(9), x, t, ctx)
    o_e = net_e.apply(params, x, t, ctx)
    o_t = net_t.apply(params, x, t, ctx)  # identical tree: same params reusable
    assert np.isfinite(np.asarray(o_t)).all()
    np.testing.assert_allclose(np.asarray(o_e), np.asarray(o_t), atol=5e-2)
    assert np.abs(np.asarray(o_e) - np.asarray(o_t)).max() > 0  # actually different path
