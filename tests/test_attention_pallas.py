"""Fused Pallas window-attention parity vs the XLA path.

The kernel runs in interpret mode on CPU (Mosaic lowering is exercised on
the real chip by bench.py and the TPU-side integration runs); these tests
pin the *math* — forward and gradients — against the composed flax modules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbanet_tpu.config import ModelConfig
from fbanet_tpu.models import init_model
from fbanet_tpu.models.layers import SwinLayer, shift_attention_mask
from fbanet_tpu.ops.attention_pallas import (
    fused_window_attention,
    pick_block_windows,
    window_attention_reference,
)


def _rand_params(rng, c, heads, ws):
    k = iter(jax.random.split(jax.random.key(rng), 12))
    n = ws * ws
    return dict(
        ln_scale=jax.random.normal(next(k), (c,)) * 0.1 + 1.0,
        ln_bias=jax.random.normal(next(k), (c,)) * 0.1,
        wq=jax.random.normal(next(k), (c, c)) * c ** -0.5,
        bq=jax.random.normal(next(k), (c,)) * 0.1,
        wkv=jax.random.normal(next(k), (c, 2 * c)) * c ** -0.5,
        bkv=jax.random.normal(next(k), (2 * c,)) * 0.1,
        wproj=jax.random.normal(next(k), (c, c)) * c ** -0.5,
        bproj=jax.random.normal(next(k), (c,)) * 0.1,
        bias=jax.random.normal(next(k), (heads, n, n)) * 0.5,
    )


@pytest.mark.parametrize("heads,c", [(1, 16), (2, 32), (4, 32)])
@pytest.mark.parametrize("masked", [False, True])
def test_fused_matches_reference(heads, c, masked):
    ws, img = 4, 16
    n, nw = ws * ws, (img // ws) ** 2
    g = 2 * nw  # batch of 2 images
    p = _rand_params(heads * 100 + c, c, heads, ws)
    x = jax.random.normal(jax.random.key(7), (g, n, c))
    mask = (jnp.asarray(shift_attention_mask(img, img, ws, ws // 2))
            if masked else None)

    ref = window_attention_reference(x, **p, mask=mask, heads=heads)
    got = fused_window_attention(x, **p, mask=mask, heads=heads,
                                 windows_per_image=nw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_bf16_close():
    heads, c, ws, img = 2, 32, 4, 8
    n, nw = ws * ws, (img // ws) ** 2
    p = _rand_params(3, c, heads, ws)
    x = jax.random.normal(jax.random.key(9), (3 * nw, n, c), jnp.bfloat16)
    ref = window_attention_reference(x, **p, mask=None, heads=heads,
                                     compute_dtype=jnp.bfloat16)
    got = fused_window_attention(x, **p, mask=None, heads=heads,
                                 windows_per_image=nw,
                                 compute_dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=0.05)


def test_fused_gradients_match_reference():
    """custom_vjp backward == autodiff through the XLA reference."""
    heads, c, ws, img = 2, 16, 4, 8
    n, nw = ws * ws, (img // ws) ** 2
    p = _rand_params(11, c, heads, ws)
    x = jax.random.normal(jax.random.key(13), (2 * nw, n, c))
    mask = jnp.asarray(shift_attention_mask(img, img, ws, ws // 2))

    def loss_fused(x, wq):
        out = fused_window_attention(x, **{**p, "wq": wq}, mask=mask,
                                     heads=heads, windows_per_image=nw,
                                     interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(x, wq):
        out = window_attention_reference(x, **{**p, "wq": wq}, mask=mask,
                                         heads=heads)
        return jnp.sum(out ** 2)

    gx1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(x, p["wq"])
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, p["wq"])
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               atol=1e-4, rtol=1e-4)


def test_pick_block_windows_divides():
    for nw in (16, 25, 100, 400):
        gb = pick_block_windows(nw, 64, 64)
        assert nw % gb == 0 and gb >= 1


TINY = ModelConfig(num_frames=2, img_size=16, embed_dim=16, window_size=4,
                   heads=(1, 2, 4, 8, 4, 4, 2, 2, 2), dtype="float32",
                   drop_path_rate=0.0)


def test_swinlayer_pallas_vs_xla_params_interchange():
    """The two impls share one parameter tree and produce the same output
    (bit-compat params; values equal to float tolerance)."""
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 16))
    for shift in (0, 2):
        la = SwinLayer(dim=16, input_resolution=(16, 16), heads=2,
                       window_size=4, shift_size=shift, attention_impl="xla")
        lb = SwinLayer(dim=16, input_resolution=(16, 16), heads=2,
                       window_size=4, shift_size=shift,
                       attention_impl="pallas")
        pa = la.init(jax.random.key(1), x)
        pb = lb.init(jax.random.key(1), x)
        # identical trees (names AND values: same init rngs)
        ja, jb = jax.tree_util.tree_structure(pa), jax.tree_util.tree_structure(pb)
        assert ja == jb
        for va, vb in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        ya = la.apply(pa, x)
        yb = lb.apply(pb, x)
        np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                                   atol=1e-5, rtol=1e-5)


def test_model_forward_pallas_vs_xla():
    """Full FBANet forward: fused attention == XLA attention."""
    model_x, params = init_model(TINY.replace(attention_impl="xla"),
                                 jax.random.key(0))
    model_p, _ = init_model(TINY.replace(attention_impl="pallas"),
                            jax.random.key(0))
    burst = jax.random.uniform(jax.random.key(5), (1, 2, 16, 16, 3))
    ya = model_x.apply(params, burst, deterministic=True)
    yb = model_p.apply(params, burst, deterministic=True)  # same params!
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               atol=2e-5, rtol=1e-4)


def test_model_grads_pallas_vs_xla():
    model_x, params = init_model(TINY.replace(attention_impl="xla"),
                                 jax.random.key(0))
    model_p, _ = init_model(TINY.replace(attention_impl="pallas"),
                            jax.random.key(0))
    burst = jax.random.uniform(jax.random.key(5), (1, 2, 16, 16, 3))
    hr = jax.random.uniform(jax.random.key(6), (1, 64, 64, 3))

    def loss(model):
        def f(p):
            out = model.apply(p, burst, deterministic=True)
            return jnp.mean((out - hr) ** 2)
        return f

    ga = jax.grad(loss(model_x))(params)
    gb = jax.grad(loss(model_p))(params)
    for va, vb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   atol=1e-5, rtol=1e-3)


# ------------------------------------------- partition-fused (4-D) variant ----

def _partition_np(x4, ws):
    b, h, w, c = x4.shape
    xw = x4.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(b * (h // ws) * (w // ws), ws * ws, c)


def _reverse_np(win, ws, b, h, w):
    c = win.shape[-1]
    xw = win.reshape(b, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(b, h, w, c)


@pytest.mark.parametrize("heads,c", [(2, 32), (4, 32)])
@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("img", [16, 48])
def test_fused_2d_matches_reference(heads, c, masked, img):
    """4-D-input kernel (window partition/merge in VMEM) == reference on the
    partitioned windows. img=48 forces nr=4 with 3 window-row grid steps,
    exercising the mask BlockSpec row indexing; img=16 is single-step."""
    from fbanet_tpu.ops.attention_pallas import fused_window_attention_2d

    ws = 4
    p = _rand_params(heads * 10 + c + img, c, heads, ws)
    x4 = jax.random.normal(jax.random.key(17), (2, img, img, c))
    mask = (jnp.asarray(shift_attention_mask(img, img, ws, ws // 2))
            if masked else None)

    ref = window_attention_reference(_partition_np(x4, ws), **p, mask=mask,
                                     heads=heads)
    ref4 = _reverse_np(ref, ws, 2, img, img)
    got = fused_window_attention_2d(x4, **p, mask=mask, heads=heads,
                                    window_size=ws, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref4),
                               atol=1e-5, rtol=1e-5)


def test_fused_2d_gradients_match_reference():
    """custom_vjp backward (partition-in-XLA + windowed Pallas bwd) ==
    autodiff through the XLA reference, on x and a weight."""
    from fbanet_tpu.ops.attention_pallas import fused_window_attention_2d

    heads, c, ws, img = 2, 16, 4, 8
    p = _rand_params(19, c, heads, ws)
    x4 = jax.random.normal(jax.random.key(23), (2, img, img, c))
    mask = jnp.asarray(shift_attention_mask(img, img, ws, ws // 2))

    def loss_fused(x4, wq):
        out = fused_window_attention_2d(
            x4, **{**p, "wq": wq}, mask=mask, heads=heads, window_size=ws,
            interpret=True, use_pallas_bwd=True)
        return jnp.sum(out ** 2)

    def loss_ref(x4, wq):
        win = window_attention_reference(
            _partition_np(x4, ws), **{**p, "wq": wq}, mask=mask, heads=heads)
        return jnp.sum(_reverse_np(win, ws, 2, img, img) ** 2)

    gx1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(x4, p["wq"])
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x4, p["wq"])
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               atol=1e-4, rtol=1e-4)


def test_fused_2d_residual_matches_composition():
    """residual=True == x + branch, forward and gradients (the in-kernel
    skip add used when drop_path is the identity)."""
    from fbanet_tpu.ops.attention_pallas import fused_window_attention_2d

    heads, c, ws, img = 2, 16, 4, 8
    p = _rand_params(29, c, heads, ws)
    x4 = jax.random.normal(jax.random.key(31), (2, img, img, c))
    mask = jnp.asarray(shift_attention_mask(img, img, ws, ws // 2))

    def f_res(x4, wq):
        out = fused_window_attention_2d(
            x4, **{**p, "wq": wq}, mask=mask, heads=heads, window_size=ws,
            interpret=True, use_pallas_bwd=True, residual=True)
        return jnp.sum(out ** 2)

    def f_comp(x4, wq):
        out = x4 + fused_window_attention_2d(
            x4, **{**p, "wq": wq}, mask=mask, heads=heads, window_size=ws,
            interpret=True, use_pallas_bwd=True)
        return jnp.sum(out ** 2)

    np.testing.assert_allclose(float(f_res(x4, p["wq"])),
                               float(f_comp(x4, p["wq"])), rtol=1e-6)
    g1 = jax.grad(f_res, argnums=(0, 1))(x4, p["wq"])
    g2 = jax.grad(f_comp, argnums=(0, 1))(x4, p["wq"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_fused_leff_residual_matches_composition():
    from fbanet_tpu.ops.leff_pallas import fused_leff

    c = 16
    p = _leff_params(27, c, 4 * c)
    x = jax.random.normal(jax.random.key(33), (1, 16, 16, c))

    def f_res(x, w1):
        return jnp.sum(fused_leff(x, **{**p, "w1": w1}, interpret=True,
                                  use_pallas_bwd=True, residual=True) ** 2)

    def f_comp(x, w1):
        return jnp.sum((x + fused_leff(x, **{**p, "w1": w1}, interpret=True,
                                       use_pallas_bwd=True)) ** 2)

    np.testing.assert_allclose(float(f_res(x, p["w1"])),
                               float(f_comp(x, p["w1"])), rtol=1e-6)
    g1 = jax.grad(f_res, argnums=(0, 1))(x, p["w1"])
    g2 = jax.grad(f_comp, argnums=(0, 1))(x, p["w1"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


# ------------------------------------------------------------ fused LeFF ----

def _leff_params(rng, c, ch):
    k = iter(jax.random.split(jax.random.key(rng), 9))
    return dict(
        ln_scale=jax.random.normal(next(k), (c,)) * 0.1 + 1.0,
        ln_bias=jax.random.normal(next(k), (c,)) * 0.1,
        w1=jax.random.normal(next(k), (c, ch)) * c ** -0.5,
        b1=jax.random.normal(next(k), (ch,)) * 0.1,
        wdw=jax.random.normal(next(k), (3, 3, 1, ch)) * 0.3,
        bdw=jax.random.normal(next(k), (ch,)) * 0.1,
        w2=jax.random.normal(next(k), (ch, c)) * ch ** -0.5,
        b2=jax.random.normal(next(k), (c,)) * 0.1,
    )


@pytest.mark.parametrize("h,w,c", [(16, 16, 16), (8, 24, 32)])
def test_fused_leff_matches_reference(h, w, c):
    from fbanet_tpu.ops.leff_pallas import fused_leff, leff_reference

    p = _leff_params(c, c, 4 * c)
    x = jax.random.normal(jax.random.key(3), (2, h, w, c))
    ref = leff_reference(x, **p)
    got = fused_leff(x, **p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_leff_gradients_match_reference():
    from fbanet_tpu.ops.leff_pallas import fused_leff, leff_reference

    c = 16
    p = _leff_params(7, c, 4 * c)
    x = jax.random.normal(jax.random.key(5), (1, 16, 16, c))

    def lf(fn):
        def go(x, w1):
            return jnp.sum(fn(x, **{**p, "w1": w1}) ** 2)
        return go

    g1 = jax.grad(lf(lambda x, **kw: fused_leff(x, **kw, interpret=True)),
                  argnums=(0, 1))(x, p["w1"])
    g2 = jax.grad(lf(leff_reference), argnums=(0, 1))(x, p["w1"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


# ------------------------------------------------- Pallas backward kernels ----

@pytest.mark.parametrize("heads,c,masked", [(2, 32, True), (4, 32, False)])
def test_attention_pallas_backward_all_grads(heads, c, masked):
    """The hand-written backward kernel matches autodiff through the XLA
    reference on every input gradient (x + 9 parameters)."""
    ws, img = 4, 8
    n, nw = ws * ws, (img // ws) ** 2
    g = 3 * nw
    p = _rand_params(heads * 7 + c, c, heads, ws)
    x = jax.random.normal(jax.random.key(50), (g, n, c))
    gc = jax.random.normal(jax.random.key(51), (g, n, c))
    mask = (jnp.asarray(shift_attention_mask(img, img, ws, ws // 2))
            if masked else None)
    args = tuple(p.values())

    def loss(fn):
        return lambda x, *a: jnp.sum(fn(x, *a) * gc)

    f1 = lambda x, *a: fused_window_attention(  # noqa: E731
        x, *a, mask=mask, heads=heads, windows_per_image=nw, interpret=True,
        use_pallas_bwd=True)
    f2 = lambda x, *a: window_attention_reference(  # noqa: E731
        x, *a, mask=mask, heads=heads)
    g1 = jax.grad(loss(f1), argnums=tuple(range(10)))(x, *args)
    g2 = jax.grad(loss(f2), argnums=tuple(range(10)))(x, *args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_leff_pallas_backward_all_grads():
    from fbanet_tpu.ops.leff_pallas import fused_leff, leff_reference

    c, ch = 16, 64
    p = _leff_params(21, c, ch)
    x = jax.random.normal(jax.random.key(52), (2, 16, 24, c))
    gc = jax.random.normal(jax.random.key(53), (2, 16, 24, c))
    args = tuple(p.values())

    def loss(fn):
        return lambda x, *a: jnp.sum(fn(x, *a) * gc)

    g1 = jax.grad(loss(lambda x, *a: fused_leff(x, *a, interpret=True,
                                                use_pallas_bwd=True)),
                  argnums=tuple(range(9)))(x, *args)
    g2 = jax.grad(loss(leff_reference), argnums=tuple(range(9)))(x, *args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_leff_pallas_backward_2d_all_grads():
    """The column-blocked 2-D backward kernel matches autodiff through the
    XLA reference on every gradient. (Since the r3 dispatch change the
    production path sends column-blocked shapes to the XLA vjp — measured
    faster — so this kernel is explicit-opt-in; the parity proof stays.)"""
    from fbanet_tpu.ops.leff_pallas import (
        _LeffStatic,
        _pallas_backward_2d,
        leff_reference,
    )

    c, ch = 16, 32
    p = _leff_params(33, c, ch)
    x = jax.random.normal(jax.random.key(54), (2, 16, 16, c))
    gc = jax.random.normal(jax.random.key(55), (2, 16, 16, c))
    args = tuple(p.values())

    cfg = _LeffStatic(compute_dtype="float32", rows=4, interpret=True,
                      use_pallas_bwd=True)
    got = _pallas_backward_2d(cfg, x, gc, *args[:-1], rows=4, wb=8)

    def loss(x, *a):
        return jnp.sum(leff_reference(x, *a) * gc)

    want = jax.grad(loss, argnums=tuple(range(9)))(x, *args)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_leff_fwd_row_picker_bf16_production_shapes():
    """Every bf16 production shape keeps 8-row forward strips (bf16 h1 +
    the 13.5 MB recalibrated budget); a budget/estimate edit that silently
    degrades strip heights fails here instead of at bench time."""
    from fbanet_tpu.ops.leff_pallas import _pick_fwd_rows

    for (h, w, c, ch) in [(160, 160, 64, 256), (80, 80, 128, 512),
                          (40, 40, 256, 1024), (160, 160, 128, 512),
                          (80, 80, 256, 1024)]:
        assert _pick_fwd_rows(h, w, c, ch, hbytes=2) == 8, (h, w, c, ch)


def test_leff_bwd_block_picker_covers_decoder_shapes():
    """Picker invariants: decoder shapes need column halving (wb < w — the
    signal _fused_bwd uses to dispatch those to the XLA vjp); encoder
    shapes keep full-width strips (where the Pallas bwd measured faster)."""
    from fbanet_tpu.ops.leff_pallas import _pick_bwd_blocks

    # decoder shapes that previously fell back to the XLA vjp
    r, wb = _pick_bwd_blocks(160, 160, 512)
    assert r >= 2 and wb < 160 and 160 % wb == 0
    r, wb = _pick_bwd_blocks(80, 80, 1024)
    assert r >= 2 and wb < 80 and 80 % wb == 0
    # encoder shapes keep full-width strips (cheapest halo traffic)
    r, wb = _pick_bwd_blocks(160, 160, 256)
    assert r >= 2 and wb == 160
    r, wb = _pick_bwd_blocks(80, 80, 512)
    assert r >= 2 and wb == 80
    r, wb = _pick_bwd_blocks(40, 40, 1024)
    assert r >= 2 and wb == 40


# --------------------------------------------------------------------------
# FAF affinity gate (ops/faf_gate.py)
# --------------------------------------------------------------------------


def test_faf_gate_matches_materialized_form():
    """The depthwise + lane-reduce gate == the naive materialized form
    (C_out=1 channel-summed conv, explicit |s_k - s_0| and sigmoid, frame-0
    passthrough) — the algebra the reference computes via full [B*F,H,W,C]
    embeddings (fba_net/blocks/federated_affinity_fusion.py:67-108)."""
    from jax import lax

    from fbanet_tpu.ops.faf_gate import affinity_gate

    rng = np.random.default_rng(10)
    b, f, h, w, c = 2, 3, 16, 16, 8
    x = jnp.asarray(rng.normal(size=(b, f, h, w, c)).astype(np.float32))
    wsum = jnp.asarray(rng.normal(size=(3, 3, c)).astype(np.float32))

    got = affinity_gate(x, wsum, compute_dtype=jnp.float32)

    dn = lax.conv_dimension_numbers((b * f, h, w, c), (3, 3, c, 1),
                                    ("NHWC", "HWIO", "NHWC"))
    s = lax.conv_general_dilated(x.reshape(b * f, h, w, c),
                                 wsum[..., None], (1, 1),
                                 [(1, 1), (1, 1)],
                                 dimension_numbers=dn)
    s = s.reshape(b, f, h, w)
    gate = jax.nn.sigmoid(jnp.abs(s - s[:, :1]))[..., None]
    want = x * gate.at[:, 0].set(1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
