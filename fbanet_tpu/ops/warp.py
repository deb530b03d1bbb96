"""On-device image warping — the framework's "native" resampling layer.

Replaces three native components of the reference (SURVEY.md §2.4):
- N2: `cv2.warpPerspective`/`cv2.warpAffine` inverse-map resampling
  (reference: fba_net/homography_alignment.py:48-55,122-129),
- N4: DALI's NPP `remap` backward-warp by `grid - flow`
  (reference: fba_net/pipeline/real_bsr_iterator.py:121-166),
- and generalizes the pure-JAX prototype
  `jax.scipy.ndimage.map_coordinates(order=1, mode="nearest")`
  (reference: fba_net/registration/optical_flow/register.py:11-47).

Everything is batched and channels-last. The XLA path lowers the 4-neighbor
(bilinear) / 16-neighbor (cubic) gathers directly; `fbanet_tpu.ops.warp_pallas`
holds the hand-written TPU kernel for the hot path, validated against this
module.

Conventions:
- Coordinates are `(y, x)` pixel centers; `coords[..., 0]` is the source row.
- A warp matrix `M` maps *output* (aligned/reference-frame) pixel coords to
  *source* coords — OpenCV's `WARP_INVERSE_MAP` convention, which is what the
  reference's alignment uses.
- `mode="nearest"` clamps source coords to the image (map_coordinates
  semantics); `mode="constant"` yields `cval` outside (cv2 BORDER_CONSTANT).
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

Array = jnp.ndarray
Mode = Literal["nearest", "constant"]
Interp = Literal["nearest", "bilinear", "bicubic"]


def homography_coords(matrix: Array, height: int, width: int) -> Array:
    """Source-coordinate map of a 3x3 (or 2x3) warp over an output grid.

    Returns `[H, W, 2]` float32 (y, x) source coordinates: the positions at
    which to sample the source image for each output pixel. `matrix` uses
    (x, y) column order like OpenCV: `[x_src, y_src, w] = M @ [x_dst, y_dst, 1]`.
    """
    matrix = jnp.asarray(matrix, jnp.float32)
    if matrix.shape == (2, 3):
        matrix = jnp.concatenate(
            [matrix, jnp.array([[0.0, 0.0, 1.0]], jnp.float32)], axis=0)
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    # explicit elementwise arithmetic: an einsum here would hit the MXU at
    # default (bf16) matmul precision and quantize the coordinates
    m = matrix
    sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    sw = m[2, 0] * xs + m[2, 1] * ys + m[2, 2]
    denom = jnp.where(jnp.abs(sw) < 1e-12, 1e-12, sw)
    return jnp.stack([sy / denom, sx / denom], axis=-1)  # (y, x)


def _cubic_weights(t: Array) -> tuple[Array, Array, Array, Array]:
    """Keys cubic interpolation weights (a = -0.75, OpenCV's INTER_CUBIC
    coefficient — verified to 1e-7 against cv2.warpPerspective) for taps at
    offsets (-1, 0, 1, 2) relative to the floor cell."""
    a = -0.75
    t2, t3 = t * t, t * t * t
    w0 = a * (t3 - 2 * t2 + t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w3 = a * (t2 - t3)
    return w0, w1, w2, w3


def warp_image(
    image: Array,
    coords: Array,
    *,
    interp: Interp = "bilinear",
    mode: Mode = "nearest",
    cval: float = 0.0,
) -> Array:
    """Resample `image` `[H, W, C]` at `coords` `[Ho, Wo, 2]` -> `[Ho, Wo, C]`.

    The gather core: neighbor integer coords are clamped into range and the
    4 (or 16) taps are blended; for `mode="constant"` out-of-range outputs
    are overwritten with `cval` afterwards.
    """
    h, w, _c = image.shape
    cy, cx = coords[..., 0], coords[..., 1]
    img = image.astype(jnp.float32)

    def tap(yi: Array, xi: Array) -> Array:
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[yc, xc]  # gather -> [Ho, Wo, C]
        if mode == "constant":
            # per-tap border: out-of-range taps contribute cval, so partially
            # outside pixels blend with the border like cv2 BORDER_CONSTANT
            inside = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
            vals = jnp.where(inside, vals, jnp.float32(cval))
        return vals

    if interp == "nearest":
        out = tap(jnp.round(cy).astype(jnp.int32), jnp.round(cx).astype(jnp.int32))
    elif interp == "bilinear":
        y0 = jnp.floor(cy).astype(jnp.int32)
        x0 = jnp.floor(cx).astype(jnp.int32)
        fy = (cy - y0)[..., None]
        fx = (cx - x0)[..., None]
        top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
        bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
        out = top * (1 - fy) + bot * fy
    elif interp == "bicubic":
        y0 = jnp.floor(cy).astype(jnp.int32)
        x0 = jnp.floor(cx).astype(jnp.int32)
        wy = _cubic_weights((cy - y0)[..., None])
        wx = _cubic_weights((cx - x0)[..., None])
        out = jnp.zeros_like(tap(y0, x0))
        for i, wyi in enumerate(wy):
            row = jnp.zeros_like(out)
            for j, wxj in enumerate(wx):
                row = row + wxj * tap(y0 + i - 1, x0 + j - 1)
            out = out + wyi * row
    else:
        raise ValueError(f"unknown interp {interp}")

    return out.astype(image.dtype) if jnp.issubdtype(image.dtype, jnp.floating) else out


def warp_flow(
    frame: Array,
    flow: Array,
    *,
    interp: Interp = "bilinear",
    mode: Mode = "nearest",
) -> Array:
    """Backward-warp `frame` `[H, W, C]` by dense `flow` `[H, W, 2]` (x, y
    displacement as produced by optical flow): sample at `grid - flow`.

    Matches the reference's DALI remap graph (`grid - flow`,
    fba_net/pipeline/real_bsr_iterator.py:121-166) and its JAX prototype
    (fba_net/registration/optical_flow/register.py:34-41). `flow[..., 0]` is
    the x-displacement, `flow[..., 1]` the y-displacement.
    """
    h, w, _ = frame.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([ys - flow[..., 1], xs - flow[..., 0]], axis=-1)
    return warp_image(frame, coords, interp=interp, mode=mode)


def warp_burst_homography(
    frames: Array,
    matrices: Array,
    *,
    interp: Interp = "bilinear",
    mode: Mode = "nearest",
    use_pallas: bool = False,
) -> Array:
    """Warp a burst `[F, H, W, C]` by per-frame matrices `[F, 3, 3]` (or
    `[F, 2, 3]`) in one batched on-device op.

    This one call replaces the reference's 16-process x 16-thread OpenCV
    pipeline that warped 13 frames per burst on CPU
    (fba_net/homography_alignment.py:147-198). Leading batch dims broadcast:
    `[B, F, H, W, C]` with `[B, F, 3, 3]` also works.
    """
    frames = jnp.asarray(frames)
    matrices = jnp.asarray(matrices, jnp.float32)
    if matrices.shape[-2:] == (2, 3):
        pad = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                               matrices.shape[:-2] + (1, 3))
        matrices = jnp.concatenate([matrices, pad], axis=-2)

    h, w = frames.shape[-3], frames.shape[-2]

    if use_pallas and interp == "bilinear":
        from fbanet_tpu.ops.warp_pallas import warp_burst_bilinear_pallas

        lead = frames.shape[:-3]
        out = warp_burst_bilinear_pallas(
            frames.reshape((-1,) + frames.shape[-3:]),
            matrices.reshape(-1, 3, 3), mode=mode)
        return out.reshape(lead + out.shape[1:])

    def one(frame: Array, mat: Array) -> Array:
        return warp_image(frame, homography_coords(mat, h, w),
                          interp=interp, mode=mode)

    fn = one
    for _ in range(frames.ndim - 3):
        fn = jax.vmap(fn)
    return fn(frames, matrices)
