"""Quality metrics with the reference's boundary-crop semantics.

The published 31.012 dB / 0.898 SSIM numbers are computed with a 40-pixel
boundary crop on every side (reference: fba_net/utils/image_utils.py:152,227-228)
on predictions clamped to [0, 1] (reference: fba_net/test.py:71-72).

Averaging quirk preserved and documented: the reference's eval scripts divide
the summed per-image PSNR by the *dataset* length but SSIM/LPIPS by the
*loader* length (reference: fba_net/test.py:86-90). With drop_last=False both
agree only when batch_size == 1; `evaluate.py` here follows the per-image
average (the mathematically meaningful one) and reports both when they differ.

All functions are jit-friendly and channels-last `[..., H, W, C]`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def _boundary_crop(x: Array, boundary_ignore: int | None) -> Array:
    if boundary_ignore:
        b = boundary_ignore
        return x[..., b:-b, b:-b, :]
    return x


def psnr(pred: Array, target: Array, *, boundary_ignore: int | None = None,
         max_value: float = 1.0) -> Array:
    """Per-image PSNR; reduces over the trailing [H, W, C] dims only.

    Reference: fba_net/utils/image_utils.py:114-152 (PSNR_class over an l2
    PixelWiseError with boundary_ignore; 20*log10(max) - 10*log10(mse)).
    """
    pred = _boundary_crop(pred, boundary_ignore)
    target = _boundary_crop(target, boundary_ignore)
    mse = jnp.mean((pred - target) ** 2, axis=(-3, -2, -1))
    return 20.0 * jnp.log10(max_value) - 10.0 * jnp.log10(mse)


def batch_psnr(pred: Array, target: Array, *, boundary_ignore: int | None = 40,
               average: bool = True) -> Array:
    """Mean (or sum) of per-image PSNR over the batch.

    Reference: fba_net/utils/image_utils.py:155-160 (batch_PSNR with
    boundary_ignore=40 via myPSNR_version2).
    """
    per_image = psnr(pred, target, boundary_ignore=boundary_ignore)
    return jnp.mean(per_image) if average else jnp.sum(per_image)


def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> Array:
    half = (size - 1) / 2.0
    coords = jnp.arange(size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def ssim(pred: Array, target: Array, *, boundary_ignore: int | None = None,
         max_value: float = 1.0, filter_size: int = 11,
         filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03) -> Array:
    """Per-image SSIM (Wang et al.), Gaussian 11x1.5, valid padding.

    Matches the standard SSIM used by the reference's metric stack
    (fba_net/utils/image_utils.py:163-197 wraps an `msssim.SSIM(spatial_out)`
    with boundary_ignore=40 and a mean over the spatial map; the same recipe
    as dm_pix.ssim). Reduces over trailing [H, W, C].
    """
    pred = _boundary_crop(pred, boundary_ignore).astype(jnp.float32)
    target = _boundary_crop(target, boundary_ignore).astype(jnp.float32)
    *lead, h, w, c = pred.shape
    p = pred.reshape((-1, h, w, c))
    t = target.reshape((-1, h, w, c))

    g = _gaussian_kernel1d(filter_size, filter_sigma)
    kh = jnp.tile(g[:, None, None, None], (1, 1, 1, c))  # [K,1,1,C]
    kw = jnp.tile(g[None, :, None, None], (1, 1, 1, c))  # [1,K,1,C]
    dn_h = lax.conv_dimension_numbers(p.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))

    def blur(x: Array) -> Array:
        x = lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn_h,
                                     feature_group_count=c)
        x = lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn_h,
                                     feature_group_count=c)
        return x

    mu_p, mu_t = blur(p), blur(t)
    mu_pp, mu_tt, mu_pt = blur(p * p), blur(t * t), blur(p * t)
    var_p = mu_pp - mu_p * mu_p
    var_t = mu_tt - mu_t * mu_t
    cov = mu_pt - mu_p * mu_t
    c1 = (k1 * max_value) ** 2
    c2 = (k2 * max_value) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p * mu_p + mu_t * mu_t + c1) * (var_p + var_t + c2)
    )
    out = jnp.mean(ssim_map, axis=(1, 2, 3))
    return out.reshape(tuple(lead)) if lead else out[0]


def batch_ssim(pred: Array, target: Array, *, boundary_ignore: int | None = 40) -> Array:
    """Mean per-image SSIM over the batch (reference eval: boundary 40)."""
    return jnp.mean(ssim(pred, target, boundary_ignore=boundary_ignore))


def pixelwise_error(pred: Array, target: Array, *, metric: str = "l1",
                    boundary_ignore: int | None = None,
                    valid: Array | None = None) -> Array:
    """Masked pixel-wise error: l1 / l2 / l2_sqrt / charbonnier, optional
    boundary crop and `valid`-mask weighting.

    Reference: fba_net/utils/image_utils.py:62-111 (PixelWiseError). Exact
    semantics preserved, channels-last here:
      - boundary_ignore crops every spatial edge of pred/gt/valid;
      - with a `valid` mask the reduction is
        sum(err * valid) / (sum(valid) * elem_ratio + 1e-12) where
        elem_ratio = err.size / valid.size — so a per-pixel mask broadcast
        over C channels weighs each pixel once, matching the torch code;
      - `l2_sqrt` reduces channels first: mean(sqrt(sum_c (p-g)^2)).

    Reference bug intentionally not reproduced (SURVEY.md §7 policy): the
    torch code calls `self.loss_fn(pred, gt, reduction="none")` when valid
    is given, which raises TypeError for its own charbonnier/l2_sqrt
    closures (image_utils.py:73-86,103) — masked charbonnier/l2_sqrt work
    here.
    """
    pred = _boundary_crop(pred, boundary_ignore)
    target = _boundary_crop(target, boundary_ignore)
    if valid is not None and boundary_ignore:
        b = boundary_ignore
        valid = valid[..., b:-b, b:-b, :]

    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    if metric == "l1":
        err = jnp.abs(diff)
    elif metric == "l2":
        err = diff * diff
    elif metric == "l2_sqrt":
        err = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # channel reduce
    elif metric == "charbonnier":
        eps = 1e-3
        err = jnp.sqrt(diff * diff + eps**2)
    else:
        raise ValueError(f"unknown metric {metric!r}")

    if valid is None:
        return jnp.mean(err)
    valid = valid.astype(jnp.float32)
    if metric == "l2_sqrt" and valid.ndim == err.ndim + 1:
        valid = valid[..., 0]  # per-pixel mask against the channel-reduced map
    elem_ratio = err.size / valid.size
    return (err * valid).sum() / (valid.sum() * elem_ratio + 1e-12)


def finite_average(values, total_count: int | None = None) -> float:
    """The reference's metric averaging: sum of *finite* per-image values
    divided by the *total* image count (non-finite images contribute 0).

    This is exactly what the legacy trainer computes: each image goes through
    `PSNR_class.forward`, which drops nan/inf values and returns 0 for an
    all-nan input (fba_net/utils/image_utils.py:143-149), and the epoch eval
    divides the sum by `len_valset` (fba_net/train.py.bak:191-193). Both
    `train.evaluate_psnr` and `evaluate.evaluate` use this single helper so
    best-checkpoint selection and the reported metric always agree
    (tests/test_losses_metrics.py::test_finite_average_paths_agree).

    `values` is any array-like of per-image metric values; `total_count`
    defaults to `len(values)` (pass it explicitly when accumulating over
    batches).
    """
    import numpy as np

    a = np.asarray(values, dtype=np.float64).reshape(-1)
    n = len(a) if total_count is None else total_count
    return float(a[np.isfinite(a)].sum() / max(1, n))
