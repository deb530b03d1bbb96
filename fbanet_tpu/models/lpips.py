"""LPIPS perceptual metric (AlexNet variant) in JAX.

Replaces the reference's torch `lpips.LPIPS(net="alex")` metric
(reference: fba_net/utils/image_utils.py:200-228, used with
boundary_ignore=40 at eval; SURVEY.md §2.4 N8).

The metric needs the pretrained AlexNet + linear-head weights, which cannot
be downloaded in a zero-egress environment. Workflow:
1. on any machine with torch + lpips installed, run
   `python scripts/export_lpips_weights.py lpips_alex.npz`,
2. pass the file via `lpips_fn = load_lpips("lpips_alex.npz")`.
`available()` reports whether a weights file was provided; the evaluation
CLI simply skips LPIPS otherwise (PSNR/SSIM are self-contained).

Faithfulness notes:
- the reference feeds [0, 1] tensors straight into lpips without the
  package's `normalize=True` rescale to [-1, 1] (test.py:77 passes clamped
  outputs; lpips' default expects [-1,1]) — we reproduce that literal
  behavior by default (`assume_reference_range=True`),
- scaling layer, per-channel unit normalization, 1x1 linear heads and
  spatial averaging follow the published LPIPS formulation.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jnp.ndarray

# AlexNet feature stack: (out_channels, kernel, stride, padding, pool_before)
_ALEX_LAYERS = (
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)


def _conv(x: Array, w: Array, b: Array, stride: int, pad: int) -> Array:
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w, (stride, stride),
                                 [(pad, pad), (pad, pad)],
                                 dimension_numbers=dn)
    return y + b


def _maxpool(x: Array) -> Array:
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1), "VALID")


def _unit_normalize(x: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS:
    """Callable LPIPS distance. Weights from `export_lpips_weights.py`."""

    def __init__(self, weights: dict[str, np.ndarray],
                 assume_reference_range: bool = True) -> None:
        self.w = {k: jnp.asarray(v) for k, v in weights.items()}
        self.assume_reference_range = assume_reference_range

    def _features(self, x: Array) -> list[Array]:
        # lpips ScalingLayer: (x - shift) / scale, x nominally in [-1, 1]
        if not self.assume_reference_range:
            x = 2.0 * x - 1.0
        x = (x - self.w["shift"]) / self.w["scale"]
        feats = []
        for i, (_c, _k, s, p, pool) in enumerate(_ALEX_LAYERS):
            if pool:
                x = _maxpool(x)
            x = _conv(x, self.w[f"conv{i}_w"], self.w[f"conv{i}_b"], s, p)
            x = jnp.maximum(x, 0.0)
            feats.append(x)
        return feats

    def __call__(self, pred: Array, target: Array,
                 boundary_ignore: int | None = None) -> Array:
        """[B, H, W, 3] x2 in [0, 1] -> per-image LPIPS distance [B]."""
        if boundary_ignore:
            b = boundary_ignore
            pred = pred[:, b:-b, b:-b, :]
            target = target[:, b:-b, b:-b, :]
        f1 = self._features(pred.astype(jnp.float32))
        f2 = self._features(target.astype(jnp.float32))
        total = jnp.zeros(pred.shape[0], jnp.float32)
        for i, (a, c) in enumerate(zip(f1, f2)):
            diff = (_unit_normalize(a) - _unit_normalize(c)) ** 2
            lin = self.w[f"lin{i}_w"]  # [C] nonnegative head weights
            total = total + jnp.mean(jnp.sum(diff * lin, axis=-1), axis=(1, 2))
        return total


def load_lpips(path: str | Path,
               assume_reference_range: bool = True) -> LPIPS:
    data = dict(np.load(path))
    return LPIPS(data, assume_reference_range=assume_reference_range)


def random_initialized_lpips(seed: int = 0) -> LPIPS:
    """Architecture smoke-test instance (random weights — NOT a valid
    perceptual metric; for tests and plumbing only)."""
    rng = np.random.default_rng(seed)
    w: dict[str, np.ndarray] = {
        "shift": np.array([-0.030, -0.088, -0.188], np.float32),
        "scale": np.array([0.458, 0.448, 0.450], np.float32),
    }
    cin = 3
    for i, (cout, k, _s, _p, _pool) in enumerate(_ALEX_LAYERS):
        w[f"conv{i}_w"] = rng.normal(0, 0.05, (k, k, cin, cout)).astype(np.float32)
        w[f"conv{i}_b"] = np.zeros(cout, np.float32)
        w[f"lin{i}_w"] = rng.uniform(0, 0.1, (cout,)).astype(np.float32)
        cin = cout
    return LPIPS(w)
