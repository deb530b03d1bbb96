"""Pallas TPU bilinear warp kernel — the framework's centerpiece native kernel.

Why a hand-written kernel: XLA:TPU lowers gathers whose indices are computed
inside the program through a T(1,128) index relayout costing ~37 ms per
160x160 frame on v5e (measured; see ops/registration.py). Mosaic has no
vector-gather primitive at all. This kernel reformulates bilinear warping as
**one-hot matrix multiplication on the MXU**:

    out[p]  = sum_h R[p, h] * img[h, :]   (row interpolation, 2 nonzeros/row)
    out[p]  = sum_w C[p, w] * tmp[p, w]   (column interpolation, VPU)

R and C are built on the fly in VMEM from `broadcasted_iota` comparisons
against the computed source coordinates — they never touch HBM (an XLA einsum
of the same formulation spends 5+ ms just streaming the materialized R).
Per-frame cost is ~4 f32-matmul GFLOP, which the MXU absorbs in tens of
microseconds; the kernel is compute-dense instead of gather-bound.

Replaces the reference's native resampling (SURVEY.md §2.4):
cv2.warpPerspective / cv2.warpAffine (homography_alignment.py:48-55,122-129)
and DALI NPP remap (pipeline/real_bsr_iterator.py:153-166).

Layout: frames are [F, C, H, W] inside the kernel (channel-major so each
channel is a contiguous [H, W] matmul operand); the public wrappers accept
channels-last and transpose at the boundary. Coordinates follow
fbanet_tpu.ops.warp conventions ((y, x), inverse-map matrices, clamp or
constant border).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_ROW_BLOCK = 8  # output rows per grid step


def _onehot3(idx: Array, size: int, dtype=jnp.bfloat16) -> tuple[Array, Array]:
    """Pure 0/1 one-hot tensors [RB, W, size] at idx and idx+1.

    0/1 values are exactly representable in bf16, so the MXU matmuls against
    them are exact selections; the fractional bilinear weights are applied in
    f32 on the VPU afterwards. (Mosaic note: everything stays rank>=2 —
    rank-1 reshapes do not lower.)
    """
    rb, w = idx.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (rb, w, size), 2)
    i0 = idx[..., None]
    return (iota == i0).astype(dtype), (iota == i0 + 1).astype(dtype)


def _warp_rows_kernel_body(cy: Array, cx: Array, frame: Array, out_ref,
                           *, h: int, w: int, c: int, constant_mode: bool,
                           cval: float) -> None:
    """Shared body: resample `frame` [C, H, W] at (cy, cx) [RB, W] -> out_ref.

    Row interpolation is a 3-D dot_general onto the MXU
    (R [RB, W, H] x img [H, W] -> [RB, W, W]); column interpolation is a
    weighted-one-hot multiply + lane reduction on the VPU.
    """
    if constant_mode:
        inside = ((cy >= 0.0) & (cy <= h - 1.0)
                  & (cx >= 0.0) & (cx <= w - 1.0))

    cyc = jnp.clip(cy, 0.0, h - 1.0)
    cxc = jnp.clip(cx, 0.0, w - 1.0)
    y0 = jnp.clip(cyc.astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(cxc.astype(jnp.int32), 0, w - 2)
    fy = cyc - y0.astype(jnp.float32)
    fx = cxc - x0.astype(jnp.float32)

    r0, r1 = _onehot3(y0, h)               # [RB, W, H] bf16 0/1
    c0, c1 = _onehot3(x0, w, jnp.float32)  # [RB, W, W] f32 0/1 (VPU side)
    cw = c0 * (1.0 - fx)[..., None] + c1 * fx[..., None]

    def rowsel(onehot: Array, img: Array) -> Array:
        """Exact row selection: hi/lo f32 split, bf16 0/1 one-hot matmuls."""
        hi = img.astype(jnp.bfloat16)
        lo = (img - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((2,), (0,)), ((), ()))
        return (jax.lax.dot_general(onehot, hi, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(onehot, lo, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32))

    for ch in range(c):
        tmp = (rowsel(r0, frame[ch]) * (1.0 - fy)[..., None]
               + rowsel(r1, frame[ch]) * fy[..., None])  # [RB, W, W]
        val = jnp.sum(cw * tmp, axis=2)  # [RB, W]
        if constant_mode:
            # whole-pixel border mask (the XLA path implements the exact
            # per-tap cv2 BORDER_CONSTANT blend)
            val = jnp.where(inside, val, cval)
        out_ref[0, ch] = val


def _homography_kernel(mats_ref, frame_ref, out_ref, *, h: int, w: int,
                       c: int, constant_mode: bool, cval: float) -> None:
    rb_idx = pl.program_id(1)
    f_idx = pl.program_id(0)
    rb = _ROW_BLOCK

    rows = (rb_idx * rb + jax.lax.broadcasted_iota(jnp.int32, (rb, w), 0)
            ).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1).astype(jnp.float32)

    m = [mats_ref[f_idx, k] for k in range(9)]
    xs = m[0] * cols + m[1] * rows + m[2]
    ys = m[3] * cols + m[4] * rows + m[5]
    den = m[6] * cols + m[7] * rows + m[8]
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    # Mosaic lowers f32 division through an approximate reciprocal (~2e-5
    # relative error -> visible pixel error); refine with one Newton step
    r = pl.reciprocal(den, approx=False)
    r = r * (2.0 - den * r)
    cx = xs * r
    cy = ys * r

    _warp_rows_kernel_body(cy, cx, frame_ref[0], out_ref, h=h, w=w, c=c,
                           constant_mode=constant_mode, cval=cval)


def _coords_kernel(frame_ref, coords_ref, out_ref, *, h: int, w: int, c: int,
                   constant_mode: bool, cval: float) -> None:
    cy = coords_ref[0, 0]
    cx = coords_ref[0, 1]
    _warp_rows_kernel_body(cy, cx, frame_ref[0], out_ref, h=h, w=w, c=c,
                           constant_mode=constant_mode, cval=cval)


@functools.partial(jax.jit, static_argnames=("mode", "cval"))
def warp_burst_bilinear_pallas(frames: Array, matrices: Array, *,
                               mode: str = "nearest", cval: float = 0.0
                               ) -> Array:
    """Warp `[F, H, W, C]` by `[F, 3, 3]` inverse-map matrices (Pallas MXU).

    Equivalent to `warp_burst_homography(..., interp="bilinear")`; matrices
    arrive via scalar prefetch so the kernel computes its own coordinates.
    H must be a multiple of 8.
    """
    f, h, w, c = frames.shape
    assert h % _ROW_BLOCK == 0, f"H={h} must be a multiple of {_ROW_BLOCK}"
    fr = frames.astype(jnp.float32).transpose(0, 3, 1, 2)  # [F, C, H, W]
    mats = matrices.astype(jnp.float32).reshape(f, 9)

    kernel = functools.partial(_homography_kernel, h=h, w=w, c=c,
                               constant_mode=(mode == "constant"), cval=cval)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f, h // _ROW_BLOCK),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda fi, ri, m: (fi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, _ROW_BLOCK, w),
                               lambda fi, ri, m: (fi, 0, ri, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((f, c, h, w), jnp.float32),
        grid_spec=grid_spec,
    )(mats, fr)
    return out.transpose(0, 2, 3, 1).astype(frames.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "cval"))
def warp_burst_coords_pallas(frames: Array, coords: Array, *,
                             mode: str = "nearest", cval: float = 0.0
                             ) -> Array:
    """Warp `[F, H, W, C]` at dense `coords` `[F, H, W, 2]` ((y, x) source
    positions) — the NPP-remap / flow-map form (grid - flow is computed by
    the caller, reference: fba_net/pipeline/real_bsr_iterator.py:153-166)."""
    f, h, w, c = frames.shape
    assert h % _ROW_BLOCK == 0, f"H={h} must be a multiple of {_ROW_BLOCK}"
    fr = frames.astype(jnp.float32).transpose(0, 3, 1, 2)
    co = coords.astype(jnp.float32).transpose(0, 3, 1, 2)  # [F, 2, H, W]

    kernel = functools.partial(_coords_kernel, h=h, w=w, c=c,
                               constant_mode=(mode == "constant"), cval=cval)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((f, c, h, w), jnp.float32),
        grid=(f, h // _ROW_BLOCK),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda fi, ri: (fi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, _ROW_BLOCK, w), lambda fi, ri: (fi, 0, ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, _ROW_BLOCK, w),
                               lambda fi, ri: (fi, 0, ri, 0),
                               memory_space=pltpu.VMEM),
    )(fr, co)
    return out.transpose(0, 2, 3, 1).astype(frames.dtype)
