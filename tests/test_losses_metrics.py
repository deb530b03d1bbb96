"""Numerics tests for losses and metrics against closed-form / torch-checked values."""

import jax.numpy as jnp
import numpy as np
import pytest

from fbanet_tpu import losses, metrics


def test_charbonnier_zero_diff():
    x = jnp.ones((2, 8, 8, 3)) * 0.5
    # diff == 0 -> sqrt(eps^2) == eps
    assert np.isclose(float(losses.charbonnier_loss(x, x, eps=1e-3)), 1e-3)


def test_charbonnier_known_value():
    x = jnp.zeros((1, 4, 4, 3))
    y = jnp.ones((1, 4, 4, 3)) * 0.3
    expected = np.sqrt(0.3**2 + 1e-6)
    assert np.isclose(float(losses.charbonnier_loss(x, y)), expected, rtol=1e-6)


def test_gw_loss_zero_when_equal():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    assert float(losses.gradient_weighted_loss(x, x)) == 0.0


def test_gw_loss_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    a = rng.uniform(size=(2, 3, 16, 16)).astype(np.float32)  # NCHW for torch
    b = rng.uniform(size=(2, 3, 16, 16)).astype(np.float32)

    # Independent torch evaluation of the GWLoss formula
    # (behavioral spec: fba_net/losses.py:53-80).
    sx = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]]).expand(3, 1, 3, 3)
    sy = torch.tensor([[-1.0, -2, -1], [0, 0, 0], [1, 2, 1]]).expand(3, 1, 3, 3)
    ta, tb = torch.tensor(a).clamp(0, 1), torch.tensor(b).clamp(0, 1)
    dx = (F.conv2d(ta, sx, padding=1, groups=3) - F.conv2d(tb, sx, padding=1, groups=3)).abs()
    dy = (F.conv2d(ta, sy, padding=1, groups=3) - F.conv2d(tb, sy, padding=1, groups=3)).abs()
    expected = float(((1 + 4 * dx) * (1 + 4 * dy) * (ta - tb).abs()).mean())

    got = float(losses.gradient_weighted_loss(
        jnp.asarray(a.transpose(0, 2, 3, 1)), jnp.asarray(b.transpose(0, 2, 3, 1))
    ))
    assert np.isclose(got, expected, rtol=1e-5)


def test_sobel_matches_conv_form():
    """The slice-add Sobel equals the depthwise-conv correlation with the
    documented _SOBEL_X/_SOBEL_Y kernels (orientation included); non-square
    input guards against axis mixups."""
    from jax import lax

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 12, 15, 3)).astype(np.float32))
    gx, gy = losses._sobel_gradients(x)
    kx = jnp.tile(losses._SOBEL_X[:, :, None, None], (1, 1, 1, 3))
    ky = jnp.tile(losses._SOBEL_Y[:, :, None, None], (1, 1, 1, 3))
    dn = lax.conv_dimension_numbers(x.shape, kx.shape, ("NHWC", "HWIO", "NHWC"))
    cx = lax.conv_general_dilated(x, kx, (1, 1), [(1, 1), (1, 1)],
                                  dimension_numbers=dn, feature_group_count=3)
    cy = lax.conv_general_dilated(x, ky, (1, 1), [(1, 1), (1, 1)],
                                  dimension_numbers=dn, feature_group_count=3)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(cx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(cy), atol=1e-5)


def test_tv_loss_constant_image_is_zero():
    x = jnp.full((2, 8, 8, 3), 0.7)
    assert float(losses.tv_loss(x)) == 0.0


def test_psnr_known_value():
    x = jnp.zeros((1, 100, 100, 3))
    y = jnp.full((1, 100, 100, 3), 0.1)
    # mse = 0.01 -> psnr = -10*log10(0.01) = 20
    assert np.isclose(float(metrics.psnr(x, y)[0]), 20.0, atol=1e-4)


def test_psnr_boundary_crop():
    x = jnp.zeros((1, 100, 100, 3))
    # corrupt only the boundary; interior identical except tiny eps
    y = x.at[:, :40, :, :].set(1.0)
    y = y.at[:, :, :40, :].set(1.0)
    interior_psnr = float(metrics.psnr(x + 1e-4, y, boundary_ignore=40)[0])
    # interior diff is 1e-4 -> psnr = 80 dB
    assert np.isclose(interior_psnr, 80.0, atol=0.1)


def test_batch_psnr_average_and_sum():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(4, 96, 96, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(4, 96, 96, 3)).astype(np.float32))
    s = float(metrics.batch_psnr(x, y, boundary_ignore=8, average=False))
    m = float(metrics.batch_psnr(x, y, boundary_ignore=8, average=True))
    assert np.isclose(s / 4.0, m, rtol=1e-6)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    assert np.isclose(float(metrics.ssim(x, x)[0]), 1.0, atol=1e-6)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    y = jnp.clip(x + 0.2 * jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), 0, 1)
    assert float(metrics.ssim(x, y)[0]) < 0.9


def test_ssim_matches_independent_oracle():
    """SSIM vs a windowed NumPy restatement of Wang et al. (Gaussian 11x1.5,
    valid region, no sample-covariance correction) computed with explicit
    sliding windows rather than separable convs — an always-runnable oracle
    (this environment has no skimage; when it does, the optional cross-check
    below also runs and agrees)."""
    from numpy.lib.stride_tricks import sliding_window_view

    rng = np.random.default_rng(5)
    x = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.normal(size=x.shape).astype(np.float32), 0, 1)

    size, sigma, c1, c2 = 11, 1.5, 0.01**2, 0.03**2
    g = np.exp(-((np.arange(size) - (size - 1) / 2) ** 2) / (2 * sigma**2))
    g /= g.sum()
    w = np.outer(g, g)
    maps = []
    for ch in range(3):
        xw = sliding_window_view(x[:, :, ch].astype(np.float64), (size, size))
        yw = sliding_window_view(y[:, :, ch].astype(np.float64), (size, size))
        mx = (xw * w).sum((-2, -1))
        my = (yw * w).sum((-2, -1))
        vx = (xw**2 * w).sum((-2, -1)) - mx * mx
        vy = (yw**2 * w).sum((-2, -1)) - my * my
        cov = (xw * yw * w).sum((-2, -1)) - mx * my
        maps.append(((2 * mx * my + c1) * (2 * cov + c2))
                    / ((mx * mx + my * my + c1) * (vx + vy + c2)))
    ref = float(np.mean(maps))

    got = float(metrics.ssim(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
    assert np.isclose(got, ref, atol=1e-4)

    try:
        from skimage.metrics import structural_similarity
    except ImportError:
        pass
    else:
        sk = structural_similarity(
            x, y, channel_axis=2, data_range=1.0, gaussian_weights=True,
            sigma=1.5, use_sample_covariance=False)
        assert np.isclose(got, sk, atol=2e-3)


def test_finite_average_reference_semantics():
    """finite_average = sum of finite values / total count (the legacy
    trainer's nan handling: PSNR_class drops nan/inf per image,
    image_utils.py:143-149, and the epoch eval divides by len_valset,
    train.py.bak:191-193)."""
    assert metrics.finite_average([30.0, float("inf"), 28.0]) == pytest.approx(
        58.0 / 3)
    assert metrics.finite_average([30.0, float("nan")], 2) == pytest.approx(15.0)
    assert metrics.finite_average([], 0) == 0.0
    # explicit total overrides len (batch accumulation)
    assert metrics.finite_average([10.0], 4) == pytest.approx(2.5)


def test_finite_average_paths_agree():
    """train.evaluate_psnr and evaluate's accumulation report the SAME number
    when a batch contains a non-finite per-image PSNR (e.g. an identical
    pred==gt image -> inf). Regression for the round-2 divergence where
    best-checkpoint selection and the reported metric used different
    denominators."""
    from fbanet_tpu.train import evaluate_psnr

    vals = np.array([30.0, np.inf, 28.0], np.float32)

    class FakeLoader:
        def epoch(self, epoch, **kw):
            yield {"LR": None, "HR": None}

    def fake_eval_step(params, lr, hr):
        return vals

    got_train = evaluate_psnr(fake_eval_step, None, FakeLoader(), 0)
    got_eval = metrics.finite_average(vals.tolist())
    assert got_train == pytest.approx(got_eval) == pytest.approx(58.0 / 3)
