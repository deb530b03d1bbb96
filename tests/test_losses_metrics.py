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


def test_ssim_matches_skimage_if_available():
    skimage = pytest.importorskip("skimage.metrics")
    rng = np.random.default_rng(5)
    x = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.normal(size=x.shape).astype(np.float32), 0, 1)
    ref = skimage.structural_similarity(
        x, y, channel_axis=2, data_range=1.0, gaussian_weights=True,
        sigma=1.5, use_sample_covariance=False,
    )
    got = float(metrics.ssim(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
    assert np.isclose(got, ref, atol=2e-3)
