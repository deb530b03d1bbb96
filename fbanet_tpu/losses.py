"""Training losses.

Functional JAX re-implementations of the reference's torch losses
(reference: fba_net/losses.py). All operate on channels-last arrays of any
leading batch shape `[..., H, W, C]` in [0, 1] range and reduce with a mean,
matching the reference's reductions.

The training objective that produced the published checkpoint is
`charbonnier(pred, gt) + 3 * gradient_weighted_l1(pred, gt)` applied to the
clamped prediction (reference: fba_net/train.py.bak:117-119,167-168).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

# Sobel taps used by the gradient-weighted loss
# (reference: fba_net/losses.py:62-63).
_SOBEL_X = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
_SOBEL_Y = jnp.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]])


def charbonnier_loss(pred: Array, target: Array, eps: float = 1e-3) -> Array:
    """Mean Charbonnier (smooth L1): mean(sqrt(diff^2 + eps^2)).

    Reference: fba_net/losses.py:39-50 (eps folded in squared, mean-reduced).
    """
    diff = pred - target
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def _sobel_gradients(x: Array) -> tuple[Array, Array]:
    """Depthwise 3x3 Sobel gradients of `[..., H, W, C]`, zero padding 1."""
    *lead, h, w, c = x.shape
    xf = x.reshape((-1, h, w, c))
    kx = jnp.tile(_SOBEL_X[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    ky = jnp.tile(_SOBEL_Y[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    dn = lax.conv_dimension_numbers(xf.shape, kx.shape, ("NHWC", "HWIO", "NHWC"))
    gx = lax.conv_general_dilated(xf, kx, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                                  feature_group_count=c)
    gy = lax.conv_general_dilated(xf, ky, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                                  feature_group_count=c)
    return gx.reshape(x.shape), gy.reshape(x.shape)


def gradient_weighted_loss(pred: Array, target: Array) -> Array:
    """Gradient-weighted L1: mean((1+4|dIx|)(1+4|dIy|)|x1-x2|) on clamped inputs.

    Reference: fba_net/losses.py:53-80 (GWLoss; inputs clamped to [0,1],
    depthwise Sobel with zero padding 1).
    """
    x1 = jnp.clip(pred, 0.0, 1.0)
    x2 = jnp.clip(target, 0.0, 1.0)
    ix1, iy1 = _sobel_gradients(x1)
    ix2, iy2 = _sobel_gradients(x2)
    dx = jnp.abs(ix1 - ix2)
    dy = jnp.abs(iy1 - iy2)
    return jnp.mean((1.0 + 4.0 * dx) * (1.0 + 4.0 * dy) * jnp.abs(x1 - x2))


def tv_loss(x: Array, weight: float = 1.0) -> Array:
    """Total-variation loss over `[B, H, W, C]`.

    Reference: fba_net/losses.py:19-36 (TVLoss; squared diffs normalized by
    element counts, doubled, averaged over batch). Unused by the published
    recipe but kept for parity.
    """
    b, h, w, c = x.shape
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2)
    count_h = (h - 1) * w * c
    count_w = h * (w - 1) * c
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / b


def fbanet_training_loss(
    pred: Array,
    target: Array,
    *,
    charbonnier_eps: float = 1e-3,
    gw_weight: float = 3.0,
) -> Array:
    """The published recipe's objective on the clamped prediction.

    Reference: fba_net/train.py.bak:165-168 (clamp -> charbonnier + 3*GW).
    """
    pred = jnp.clip(pred, 0.0, 1.0)
    return charbonnier_loss(pred, target, eps=charbonnier_eps) + gw_weight * gradient_weighted_loss(pred, target)
