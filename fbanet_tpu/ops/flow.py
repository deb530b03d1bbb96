"""Dense optical flow: coarse-to-fine pyramidal Lucas-Kanade, plus the
Middlebury flow visualization.

Replaces the reference's two flow components (SURVEY.md §2.4 N3):
- `fn.optical_flow` — NVIDIA's Turing/Ampere hardware optical-flow unit
  driven through DALI (reference: fba_net/pipeline/real_bsr_iterator.py:98-118,
  preset 0.0, output_grid 1, temporal hints). TPUs have no such unit, so this
  is a compute implementation: iterative dense LK over a Gaussian pyramid,
  built from convolutions/elementwise ops that map straight onto the
  VPU/MXU, vmappable over frame pairs.
- the flow -> RGB rendering with the 55-color Middlebury wheel
  (reference: fba_net/registration/optical_flow/visualize.py:22-49,91-123).

Output convention matches DALI/the reference: `flow[..., 0]` = x displacement,
`flow[..., 1]` = y displacement, such that frame ~= warp_flow(target, flow)
aligns target onto the reference frame via `grid - flow` sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jaxtyping import Float
from jaxtyping import Array as JArray

from fbanet_tpu.ops.warp import warp_flow
from fbanet_tpu.utils.shape_check import typed

Array = jnp.ndarray


def _gauss_blur(img: Array, sigma: float = 1.0, radius: int = 2) -> Array:
    """Separable Gaussian blur of [H, W]."""
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(xs**2) / (2 * sigma**2))
    k = k / jnp.sum(k)
    x = img[None, :, :, None]
    kh = k[:, None, None, None]
    kw = k[None, :, None, None]
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, kh, (1, 1), [(radius, radius), (0, 0)],
                                 dimension_numbers=dn)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (radius, radius)],
                                 dimension_numbers=dn)
    return x[0, :, :, 0]


def _halve(img: Array) -> Array:
    return _gauss_blur(img, 1.0)[::2, ::2]


def _box_sum(img: Array, radius: int) -> Array:
    """Windowed sum over a (2r+1)^2 box via two 1-D convolutions."""
    k = jnp.ones((2 * radius + 1,), jnp.float32)
    x = img[None, :, :, None]
    kh = k[:, None, None, None]
    kw = k[None, :, None, None]
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, kh, (1, 1), [(radius, radius), (0, 0)],
                                 dimension_numbers=dn)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (radius, radius)],
                                 dimension_numbers=dn)
    return x[0, :, :, 0]


def _lk_refine(ref: Array, tgt: Array, flow: Array, *, window_radius: int,
               iters: int) -> Array:
    """Iterative LK update of `flow` at one pyramid level ([H, W] images)."""
    gx = (jnp.pad(ref, 1, mode="edge")[1:-1, 2:]
          - jnp.pad(ref, 1, mode="edge")[1:-1, :-2]) * 0.5
    gy = (jnp.pad(ref, 1, mode="edge")[2:, 1:-1]
          - jnp.pad(ref, 1, mode="edge")[:-2, 1:-1]) * 0.5

    ixx = _box_sum(gx * gx, window_radius)
    ixy = _box_sum(gx * gy, window_radius)
    iyy = _box_sum(gy * gy, window_radius)
    # Levenberg-style damping scaled by the local structure tensor, so flat
    # regions still move (an absolute epsilon freezes low-contrast images)
    lam = 1e-3 * (ixx + iyy) + 1e-9
    a00, a11 = ixx + lam, iyy + lam
    det = a00 * a11 - ixy * ixy
    inv00 = a11 / det
    inv01 = -ixy / det
    inv11 = a00 / det

    h, w = ref.shape
    max_flow = 0.5 * max(h, w)

    def body(_i, flow):
        warped = warp_flow(tgt[..., None], flow)[..., 0]
        it = warped - ref
        bx = _box_sum(gx * it, window_radius)
        by = _box_sum(gy * it, window_radius)
        du = inv00 * bx + inv01 * by
        dv = inv01 * bx + inv11 * by
        upd = jnp.stack([du, dv], axis=-1)
        upd = jnp.clip(upd, -1.5, 1.5)  # damp per-iteration steps
        flow = flow + upd
        # regularize the field each iteration: flat regions otherwise
        # accumulate unconstrained noise and the loop diverges
        flow = jnp.stack([_gauss_blur(flow[..., 0], 1.0),
                          _gauss_blur(flow[..., 1], 1.0)], axis=-1)
        return jnp.clip(flow, -max_flow, max_flow)

    return lax.fori_loop(0, iters, body, flow)


@typed
def optical_flow(
    reference: Float[JArray, "h w"] | Float[JArray, "h w c"],
    target: Float[JArray, "h w"] | Float[JArray, "h w c"],
    *,
    levels: int = 4,
    window_radius: int = 4,
    iters_per_level: int = 5,
) -> Float[JArray, "h w 2"]:
    """Dense flow `[H, W, 2]` (x, y) such that `warp_flow(target, flow)`
    registers `target` onto `reference`. Inputs are `[H, W]` grayscale or
    `[H, W, C]` (converted via mean)."""
    if reference.ndim == 3:
        reference = jnp.mean(reference.astype(jnp.float32), axis=-1)
        target = jnp.mean(target.astype(jnp.float32), axis=-1)
    reference = reference.astype(jnp.float32)
    target = target.astype(jnp.float32)

    pyr_r, pyr_t = [reference], [target]
    for _ in range(levels - 1):
        pyr_r.append(_halve(pyr_r[-1]))
        pyr_t.append(_halve(pyr_t[-1]))

    h_c, w_c = pyr_r[-1].shape
    flow = jnp.zeros((h_c, w_c, 2), jnp.float32)
    for lvl in reversed(range(levels)):
        if lvl < levels - 1:
            h, w = pyr_r[lvl].shape
            flow = 2.0 * jax.image.resize(flow, (h, w, 2), method="bilinear")
        flow = _lk_refine(pyr_r[lvl], pyr_t[lvl], flow,
                          window_radius=window_radius,
                          iters=iters_per_level)
    return flow


@typed
def burst_optical_flow(burst: Float[JArray, "f h w c"], **kw
                       ) -> Float[JArray, "f-1 h w 2"]:
    """Flows of frames 1..F-1 against frame 0: `[F-1, H, W, 2]`
    (the shape the reference's DALI pipeline emits as `flows`,
    fba_net/pipeline/real_bsr_dataset.py:17)."""
    ref = burst[0]
    return jax.vmap(lambda t: optical_flow(ref, t, **kw))(burst[1:])


# --- Middlebury visualization ------------------------------------------------

def _color_wheel() -> np.ndarray:
    """The 55-color Middlebury wheel (reference:
    fba_net/registration/optical_flow/visualize.py:22-49)."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    cols = []
    for n, (a, b) in zip(
        (ry, yg, gc, cb, bm, mr),
        (((255, 0, 0), (255, 255, 0)), ((255, 255, 0), (0, 255, 0)),
         ((0, 255, 0), (0, 255, 255)), ((0, 255, 255), (0, 0, 255)),
         ((0, 0, 255), (255, 0, 255)), ((255, 0, 255), (255, 0, 0))),
    ):
        for i in range(n):
            t = i / n
            cols.append([a[c] * (1 - t) + b[c] * t for c in range(3)])
    return np.asarray(cols, np.float32) / 255.0


_WHEEL = _color_wheel()


def flow_to_image(flow: Array | np.ndarray, *, max_norm: float | None = None
                  ) -> np.ndarray:
    """Flow `[H, W, 2]` -> RGB uint8 via the Middlebury wheel."""
    flow = np.asarray(flow, np.float32)
    fx, fy = flow[..., 0], flow[..., 1]
    norm = np.sqrt(fx * fx + fy * fy)
    scale = max_norm if max_norm else max(float(norm.max()), 1e-6)
    fx, fy = fx / scale, fy / scale
    norm = np.minimum(norm / scale, 1.0)

    ncols = len(_WHEEL)
    angle = np.arctan2(-fy, -fx) / np.pi  # [-1, 1]
    fk = (angle + 1.0) / 2.0 * (ncols - 1)
    k0 = np.floor(fk).astype(int) % ncols
    k1 = (k0 + 1) % ncols
    f = (fk - np.floor(fk))[..., None]
    col = _WHEEL[k0] * (1 - f) + _WHEEL[k1] * f
    # saturate toward white at small magnitudes
    col = 1.0 - norm[..., None] * (1.0 - col)
    return (col * 255.0 + 0.5).astype(np.uint8)
