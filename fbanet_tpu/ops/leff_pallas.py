"""Fused Pallas TPU kernel for the LeFF feed-forward branch.

One SwinLayer FFN branch — LayerNorm -> Dense C->4C -> GELU -> depthwise
3x3 -> GELU -> Dense 4C->C — as a single kernel over row strips of the
spatial map. The XLA path materializes the 4C hidden activations in HBM
several times per layer (~630 MB per 160px/dim-64 layer at batch 4, the
largest single traffic source in the model); here the hidden tensor lives
only in VMEM.

Reference semantics: fba_net/layers/locally_enhanced_feed_forward.py:15-60
(Linear -> GELU -> depthwise 3x3 (zero pad) -> GELU -> Linear), preceded by
the layer's norm2 (fba_net/layers/fba_net.py:245-248 as corrected per
SURVEY.md §7.5). `leff_reference` below is the exact XLA restatement used
as the custom-VJP backward rule and the parity oracle.

Halo handling: the depthwise conv needs one neighbor row above/below the
strip. Rather than manual DMA, the kernel receives the SAME input through
three BlockSpecs indexed at (i-1, i, i+1) (clamped) and takes the edge rows
of the neighbor blocks; at image boundaries the halo contribution is zeroed
to match the conv's zero padding.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_LN_EPS = 1e-5  # torch nn.LayerNorm default — matches models/layers._LN_EPS
_ROWS = 8  # strip height per grid step


class _LeffStatic(NamedTuple):
    compute_dtype: str
    rows: int
    interpret: bool
    use_pallas_bwd: bool = True
    residual: bool = False  # kernel outputs x + branch (saves one HBM pass)


def leff_reference(x: Array, ln_scale: Array, ln_bias: Array,
                   w1: Array, b1: Array, wdw: Array, bdw: Array,
                   w2: Array, b2: Array, *, compute_dtype=jnp.float32
                   ) -> Array:
    """[B, H, W, C] -> [B, H, W, C] FFN branch output (pre-residual),
    identical math to norm2 + the flax LeFF module."""
    cdtype = jnp.dtype(compute_dtype)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = lax.rsqrt(var + _LN_EPS) * ln_scale.astype(jnp.float32)
    y = ((xf - mu) * mul + ln_bias.astype(jnp.float32)).astype(cdtype)

    h = jax.nn.gelu(y @ w1.astype(cdtype) + b1.astype(cdtype))
    ch = h.shape[-1]
    dn = lax.conv_dimension_numbers(h.shape, wdw.shape, ("NHWC", "HWIO", "NHWC"))
    h = lax.conv_general_dilated(h, wdw.astype(cdtype), (1, 1),
                                 [(1, 1), (1, 1)], dimension_numbers=dn,
                                 feature_group_count=ch) + bdw.astype(cdtype)
    h = jax.nn.gelu(h)
    out = h @ w2.astype(cdtype) + b2.astype(cdtype)
    return out.astype(x.dtype)


def _xla_fwd_residuals(x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2, *,
                       compute_dtype=jnp.float32):
    """leff_reference's exact math, additionally returning the two
    pre-activations (z1, z2) the backward needs.

    This is the TRAINING forward for the shapes where the blocked Pallas
    backward loses to XLA (the two largest decoder LeFFs — see the dispatch
    comment in _fused_bwd). The old fallback ran the Pallas forward and then
    `jax.vjp(leff_reference)` at backward time — which re-runs the entire
    forward again inside the backward (measured: leff d128@160 backward-only
    6.6 ms vs a 1.5 ms forward, scripts/measure_bwd.py). Saving z1/z2 (bf16,
    the same values the reference computes) removes that duplicate forward;
    everything else the backward needs (LN stats, gelu outputs) recomputes
    from x/z1/z2 in cheap elementwise passes."""
    cdtype = jnp.dtype(compute_dtype)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = lax.rsqrt(var + _LN_EPS) * ln_scale.astype(jnp.float32)
    y = ((xf - mu) * mul + ln_bias.astype(jnp.float32)).astype(cdtype)

    z1 = y @ w1.astype(cdtype) + b1.astype(cdtype)
    h1 = jax.nn.gelu(z1)
    ch = h1.shape[-1]
    dn = lax.conv_dimension_numbers(h1.shape, wdw.shape, ("NHWC", "HWIO",
                                                          "NHWC"))
    z2 = lax.conv_general_dilated(h1, wdw.astype(cdtype), (1, 1),
                                  [(1, 1), (1, 1)], dimension_numbers=dn,
                                  feature_group_count=ch) + bdw.astype(cdtype)
    out = jax.nn.gelu(z2) @ w2.astype(cdtype) + b2.astype(cdtype)
    return out.astype(x.dtype), (z1, z2)


def _xla_bwd_from_residuals(x, g, ln_scale, ln_bias, w1, wdw, w2, z1, z2, *,
                            compute_dtype=jnp.float32):
    """Backward for _xla_fwd_residuals: same algebra as the Pallas backward
    kernel, in whole-tensor XLA ops, consuming the saved pre-activations
    instead of recomputing the forward. Matmuls accumulate in f32; LN math
    is f32; gelu derivatives go through jax.vjp at the stored (bf16)
    precision — matching what jax.vjp(leff_reference) computed before."""
    cdtype = jnp.dtype(compute_dtype)
    f32 = jnp.float32
    b, hh, ww, c = x.shape
    ch = z1.shape[-1]

    # cheap c-wide recomputes: LN statistics and the normalized input
    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    inv = lax.rsqrt(var + _LN_EPS)
    xhat = (xf - mu) * inv
    lns = ln_scale.astype(f32)
    y2 = ((xhat * lns + ln_bias.astype(f32)).astype(cdtype)
          ).reshape(b * hh * ww, c)
    h1 = jax.nn.gelu(z1)
    h2 = jax.nn.gelu(z2)

    # dense2 backward
    g2 = g.astype(cdtype).reshape(b * hh * ww, c)
    dh2 = jnp.dot(g2, w2.astype(cdtype).T,
                  preferred_element_type=f32).reshape(z2.shape)
    dw2 = jnp.dot(h2.reshape(-1, ch).T, g2, preferred_element_type=f32)
    db2 = jnp.sum(g2.astype(f32), axis=0)

    # gelu2' + depthwise backward (XLA's own conv transposes: the input
    # grad and the batch-group weight-grad conv both compile and run at
    # conv-class rates — verified on-chip)
    _, gelu_vjp2 = jax.vjp(jax.nn.gelu, z2)
    dz2 = gelu_vjp2(dh2.astype(z2.dtype))[0]

    def dwpart(h1_, wdw_):
        dn = lax.conv_dimension_numbers(h1_.shape, wdw_.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(h1_, wdw_.astype(cdtype), (1, 1),
                                        [(1, 1), (1, 1)],
                                        dimension_numbers=dn,
                                        feature_group_count=ch)

    _, conv_vjp = jax.vjp(dwpart, h1, wdw)
    dh1, dwdw = conv_vjp(dz2)
    dbdw = jnp.sum(dz2.astype(f32), axis=(0, 1, 2))

    # gelu1' + dense1 backward
    _, gelu_vjp1 = jax.vjp(jax.nn.gelu, z1)
    dz1 = gelu_vjp1(dh1.astype(z1.dtype))[0].reshape(-1, ch)
    dw1 = jnp.dot(y2.T, dz1.astype(cdtype), preferred_element_type=f32)
    db1 = jnp.sum(dz1.astype(f32), axis=0)
    dy = jnp.dot(dz1.astype(cdtype), w1.astype(cdtype).T,
                 preferred_element_type=f32).reshape(b, hh, ww, c)

    # LayerNorm backward (f32)
    dxh = dy * lns
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx = (inv * (dxh - m1 - xhat * m2)).astype(x.dtype)
    dlns = jnp.sum(dy * xhat, axis=(0, 1, 2))
    dlnb = jnp.sum(dy, axis=(0, 1, 2))
    return dx, dlns, dlnb, dw1, db1, dwdw, dbdw, dw2, db2


def _leff_kernel(xp_ref, xc_ref, xn_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                 wdw_ref, bdw_ref, w2_ref, b2_ref, out_ref, *, rows: int,
                 w: int, c: int, ch: int, compute_dtype: str,
                 residual: bool = False) -> None:
    cdtype = jnp.dtype(compute_dtype)
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    x = jnp.concatenate([xp_ref[0, rows - 1:rows], xc_ref[0],
                         xn_ref[0, 0:1]], axis=0)  # [rows+2, W, C]

    # LayerNorm (f32, flax semantics: fast variance clamped at 0)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = lax.rsqrt(var + _LN_EPS) * lns_ref[...].astype(jnp.float32)
    y = ((xf - mu) * mul + lnb_ref[...].astype(jnp.float32)).astype(cdtype)

    # Dense C -> Ch + GELU on strip + halo rows. h1 is kept in the compute
    # dtype — the XLA reference's exact semantics (leff_reference computes
    # gelu in cdtype) — which halves the kernel's two largest VMEM temps
    # (h1 + its W-padded copy at hidden width) and lets the W=160/Ch=512
    # decoder shape keep 8-row strips under the scoped-VMEM budget.
    y2 = y.reshape((rows + 2) * w, c)
    h1 = jax.nn.gelu(
        jnp.dot(y2, w1_ref[...].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b1_ref[...].astype(jnp.float32)).astype(cdtype)
    h1 = h1.reshape(rows + 2, w, ch)

    # zero the halo rows at image boundaries (the conv zero-pads there)
    r = lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    valid = ((r > 0) | (i > 0)) & ((r < rows + 1) | (i < ni - 1))
    h1 = jnp.where(valid, h1, jnp.zeros((), cdtype))

    # depthwise 3x3, zero padding in W, halo rows in H
    h1p = jnp.pad(h1, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.broadcast_to(bdw_ref[...].astype(jnp.float32), (rows, w, ch))
    for ky in range(3):
        for kx in range(3):
            tap = wdw_ref[ky, kx].astype(jnp.float32)  # [1, Ch] -> broadcast
            acc = acc + h1p[ky:ky + rows, kx:kx + w] * tap
    h2 = jax.nn.gelu(acc).astype(cdtype)

    # Dense Ch -> C
    out = (jnp.dot(h2.reshape(rows * w, ch), w2_ref[...].astype(cdtype),
                   preferred_element_type=jnp.float32)
           + b2_ref[...].astype(jnp.float32)).reshape(rows, w, c)
    if residual:  # the strip is already in VMEM — the add is free here
        out = out + xc_ref[0].astype(out.dtype)
    out_ref[0] = out.astype(out_ref.dtype)


def _pallas_forward(cfg: _LeffStatic, x, ln_scale, ln_bias, w1, b1, wdw, bdw,
                    w2, b2):
    b, h, w, c = x.shape
    ch = w1.shape[1]
    rows = cfg.rows
    assert h % rows == 0, (h, rows)
    ni = h // rows

    kernel = functools.partial(_leff_kernel, rows=rows, w=w, c=c, ch=ch,
                               compute_dtype=cfg.compute_dtype,
                               residual=cfg.residual)
    xspec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, rows, w, c),
        lambda bi, ii, _off=off: (bi, jnp.clip(ii + _off, 0, ni - 1), 0, 0),
        memory_space=pltpu.VMEM)
    full2 = lambda *_: (0, 0)  # noqa: E731
    in_specs = [
        xspec(-1), xspec(0), xspec(1),
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),     # ln_scale
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),     # ln_bias
        pl.BlockSpec((c, ch), full2, memory_space=pltpu.VMEM),    # w1
        pl.BlockSpec((1, ch), full2, memory_space=pltpu.VMEM),    # b1
        pl.BlockSpec((3, 3, 1, ch), lambda *_: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),                    # wdw
        pl.BlockSpec((1, ch), full2, memory_space=pltpu.VMEM),    # bdw
        pl.BlockSpec((ch, c), full2, memory_space=pltpu.VMEM),    # w2
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),     # b2
    ]
    return pl.pallas_call(
        kernel,
        grid=(b, ni),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, w, c), lambda bi, ii: (bi, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=cfg.interpret,
    )(x, x, x, ln_scale.reshape(1, c), ln_bias.reshape(1, c),
      w1, b1.reshape(1, ch), wdw, bdw.reshape(1, ch), w2, b2.reshape(1, c))


# --------------------------------------------------------------------------
# Backward kernel
#
# Block locality: dx flows through per-row ops (LayerNorm, dense1) once dh1
# is known, and dh1 at row r needs dh2g at rows r-1..r+1, which needs h1 at
# rows r-2..r+2. So with an x halo of +-2 rows and a g halo of +-1 row, each
# block computes its interior dx completely -- no cross-block scatter.
# Parameter gradients are summed over interior rows only (each image row is
# interior to exactly one block) into constant-index output blocks that
# accumulate across the sequential TPU grid.
# --------------------------------------------------------------------------


def _leff_bwd_kernel(xp_ref, xc_ref, xn_ref, gp_ref, gc_ref, gn_ref, lns_ref,
                     lnb_ref, w1_ref, b1_ref, wdw_ref, bdw_ref, w2_ref,
                     dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dwdw_ref,
                     dbdw_ref, dw2_ref, db2_ref, *, rows: int, w: int,
                     c: int, ch: int, compute_dtype: str) -> None:
    cdtype = jnp.dtype(compute_dtype)
    bi = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    f32 = jnp.float32

    # --- recompute the forward on the strip with a 2-row halo ---
    x = jnp.concatenate([xp_ref[0, rows - 2:rows], xc_ref[0],
                         xn_ref[0, 0:2]], axis=0)  # [rows+4, W, C]
    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    inv = lax.rsqrt(var + _LN_EPS)
    xhat = (xf - mu) * inv
    lns = lns_ref[...].astype(f32)
    y = (xhat * lns + lnb_ref[...].astype(f32)).astype(cdtype)

    y2 = y.reshape((rows + 4) * w, c)
    w1 = w1_ref[...].astype(cdtype)
    z1 = (jnp.dot(y2, w1, preferred_element_type=f32)
          + b1_ref[...].astype(f32))  # [.., Ch] f32 pre-activation
    h1 = jax.nn.gelu(z1).reshape(rows + 4, w, ch)

    # rows outside the image contribute zeros to the conv
    r4 = lax.broadcasted_iota(jnp.int32, (rows + 4, 1, 1), 0)
    valid4 = ((r4 > 1) | (i > 0)) & ((r4 < rows + 2) | (i < ni - 1))
    h1 = jnp.where(valid4, h1, 0.0)

    # dwconv pre-activation for rows 1..rows+3 (interior + 1-row halo)
    h1p = jnp.pad(h1, ((0, 0), (1, 1), (0, 0)))
    wdw = wdw_ref[...].astype(f32)  # [3, 3, 1, Ch]
    z2 = jnp.broadcast_to(bdw_ref[...].astype(f32), (rows + 2, w, ch))
    for ky in range(3):
        for kx in range(3):
            z2 = z2 + h1p[ky:ky + rows + 2, kx:kx + w] * wdw[ky, kx, 0]
    h2 = jax.nn.gelu(z2)  # [rows+2, W, Ch], rows 0..rows+1 = image rows i*S-1..i*S+rows

    # --- incoming gradient with a 1-row halo ---
    g = jnp.concatenate([gp_ref[0, rows - 1:rows], gc_ref[0],
                         gn_ref[0, 0:1]], axis=0).astype(cdtype)  # [rows+2, W, C]
    rg = lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    validg = ((rg > 0) | (i > 0)) & ((rg < rows + 1) | (i < ni - 1))
    g = jnp.where(validg, g, 0.0)

    # dense2 backward
    g2 = g.reshape((rows + 2) * w, c)
    w2 = w2_ref[...].astype(cdtype)
    dh2 = jnp.dot(g2, w2.T, preferred_element_type=f32).reshape(rows + 2, w, ch)
    _, gelu_vjp2 = jax.vjp(jax.nn.gelu, z2)
    dz2 = gelu_vjp2(dh2)[0]  # [rows+2, W, Ch] f32

    # interior-only views (rows 1..rows of the +2 layout)
    g_int = g2.reshape(rows + 2, w, c)[1:rows + 1].reshape(rows * w, c)
    h2_int = h2[1:rows + 1].reshape(rows * w, ch).astype(cdtype)
    dz2_int = dz2[1:rows + 1]

    # depthwise backward: dh1 (needs dz2 halo) and tap gradients (interior)
    # dh1[r] = sum_ky wdw[ky] * dz2[r + 1 - ky]; dz2 rows -1..rows are
    # available in dz2 (offset by 1)
    dh1 = jnp.zeros((rows, w, ch), f32)
    dwdw_rows = []
    h1pad_w = jnp.pad(h1, ((0, 0), (1, 1), (0, 0)))  # [rows+4, W+2, Ch]
    dz2_pw = jnp.pad(dz2, ((0, 0), (1, 1), (0, 0)))  # hoisted (loop-invariant)
    for ky in range(3):
        for kx in range(3):
            # full-res dz2 slice (with halo) aligned to interior h1 rows:
            dz2_s = dz2_pw[2 - ky:2 - ky + rows, 2 - kx:2 - kx + w]
            dh1 = dh1 + dz2_s * wdw[ky, kx, 0]
            # dWdw[ky,kx] = sum over interior conv-output rows of
            # h1[r+ky-1] * dz2[r]  (h1 rows 1+ky..rows+ky in +4 layout)
            taps = (h1pad_w[1 + ky:1 + ky + rows, kx:kx + w]
                    * dz2_int)
            # keep values rank>=2 for Mosaic (no scatter / rank-1 reshapes)
            dwdw_rows.append(jnp.sum(taps.reshape(rows * w, ch), axis=0,
                                     keepdims=True))
    dwdw_acc = jnp.concatenate(dwdw_rows, axis=0)  # [9, Ch]

    # gelu backward through dense1 (interior rows: +4 layout rows 2..rows+1)
    z1_int = z1.reshape(rows + 4, w, ch)[2:rows + 2].reshape(rows * w, ch)
    _, gelu_vjp1 = jax.vjp(jax.nn.gelu, z1_int)
    dz1 = gelu_vjp1(dh1.reshape(rows * w, ch))[0]  # f32

    # dense1 backward
    y_int = y.reshape(rows + 4, w, c)[2:rows + 2].reshape(rows * w, c)
    dy = jnp.dot(dz1.astype(cdtype), w1.T,
                 preferred_element_type=f32).reshape(rows, w, c)

    # LayerNorm backward (interior rows)
    xhat_i = xhat.reshape(rows + 4, w, c)[2:rows + 2]
    inv_i = inv.reshape(rows + 4, w, 1)[2:rows + 2]
    dxh = dy * lns  # [rows, W, C] f32
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat_i, axis=-1, keepdims=True)
    dx = inv_i * (dxh - m1 - xhat_i * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # --- parameter gradient accumulation across the whole grid ---
    @pl.when((bi == 0) & (i == 0))
    def _init():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dwdw_ref[...] = jnp.zeros_like(dwdw_ref)
        dbdw_ref[...] = jnp.zeros_like(dbdw_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    rowsum = lambda a2: jnp.sum(a2, axis=0, keepdims=True)  # noqa: E731
    dlns_ref[...] += rowsum((dy * xhat_i).reshape(rows * w, c))
    dlnb_ref[...] += rowsum(dy.reshape(rows * w, c))
    dw1_ref[...] += jnp.dot(y_int.T, dz1.astype(cdtype),
                            preferred_element_type=f32)
    db1_ref[...] += rowsum(dz1)
    dwdw_ref[...] += dwdw_acc
    dbdw_ref[...] += rowsum(dz2_int.reshape(rows * w, ch))
    dw2_ref[...] += jnp.dot(h2_int.T, g_int.astype(f32),
                            preferred_element_type=f32)
    db2_ref[...] += rowsum(g_int.astype(f32))


def _pick_fwd_rows(h: int, w: int, c: int, ch: int, hbytes: int = 4,
                   vmem_budget: int = int(13.5 * 2**20)) -> int | None:
    """Largest strip height (divisor of h, <= _ROWS) whose forward-kernel
    live set fits the scoped-VMEM budget; None -> XLA fallback.

    Live temps per strip: h1 (+ its W-padded copy) at the hidden width in
    the COMPUTE dtype (`hbytes` — 2 for bf16 since r3), the f32 depthwise
    accumulator, and f32 LN temps at C. The 16 MB scoped-vmem limit was
    measured to overflow by ~84 KB at rows=8 for the W=160/Ch=512 decoder
    shape with f32 h1 once the in-kernel residual add extended the input
    block's live range; with bf16 h1 the same shape fits 8-row strips.
    Unlike the backward pickers (whose estimate runs ~1.6x below the
    compiler's scoped accounting), this estimator tracked the compiler
    ~1:1 in that failure (est 16.6 MB vs 16.08 MB actual), so the budget
    keeps ~2.5 MB headroom rather than a 1.6x factor.
    """
    for rows in range(min(_ROWS, h), 0, -1):
        if h % rows:
            continue
        est = ((rows + 2) * w * ch * (2 * hbytes + 4)    # h1 + pad + z1
               + (rows + 2) * w * c * 4 * 2              # x/y LN temps
               + rows * w * ch * (4 + hbytes))           # acc + h2
        if est <= vmem_budget:
            return rows
    return None


def _pick_bwd_rows(h: int, w: int, ch: int) -> int:
    """Strip height for the backward kernel: it holds ~7 (rows+4, W, Ch) f32
    buffers live (h1/z1/z2/dz2/dh1 + temporaries), so large hidden widths
    need shorter strips to stay inside VMEM (measured: rows=8 at W=80,
    Ch=1024 allocates 28 MB and OOMs the 16 MB budget)."""
    for r in (8, 4, 2, 1):
        # 9.5 MB budget: the estimate runs ~1.6x below the compiler's
        # scoped-vmem accounting (measured r3: an estimated 10.3 MB block
        # allocated 16.08 MB against the 16 MB limit once the fused
        # residual/2-D attention graph surrounded it), so the budget leaves
        # that factor in headroom
        if h % r == 0 and (r + 4) * w * ch * 4 * 7.5 <= 9.5 * 2**20:
            return r
    return 1


def _pick_bwd_blocks(h: int, w: int, ch: int) -> tuple[int, int]:
    """(rows, block_width) for the backward kernel. Prefers full-width row
    strips (cheapest halo traffic); when the VMEM budget forces rows < 2 —
    the +-2-row halo needs >= 2 rows per strip — it halves the width and
    retries with the column-blocked kernel (the two largest decoder shapes,
    W=160/Ch=512 and W=80/Ch=1024, only fit with column blocking). NOTE:
    `_fused_bwd` sends column-blocked results (wb < w) to the XLA vjp
    instead — measured slower than XLA at both such shapes (see dispatch
    comment there); the 2-D kernel remains available for explicit use."""
    wb = w
    while wb >= 8:
        for r in (8, 4, 2):
            eff_w = wb if wb == w else wb + 4  # column halo when blocked
            # 9.5 MB: see _pick_bwd_rows (estimate ~1.6x below actual)
            if h % r == 0 and (r + 4) * eff_w * ch * 4 * 7.5 <= 9.5 * 2**20:
                return r, wb
        if wb % 2:
            break
        wb //= 2
    return 1, w


def _pallas_backward(cfg: _LeffStatic, x, g, ln_scale, ln_bias, w1, b1, wdw,
                     bdw, w2):
    b, h, w, c = x.shape
    ch = w1.shape[1]
    rows = min(cfg.rows, _pick_bwd_rows(h, w, ch))
    ni = h // rows

    kernel = functools.partial(_leff_bwd_kernel, rows=rows, w=w, c=c, ch=ch,
                               compute_dtype=cfg.compute_dtype)
    spec = lambda arr_c, off: pl.BlockSpec(  # noqa: E731
        (1, rows, w, arr_c),
        lambda bi, ii, _off=off: (bi, jnp.clip(ii + _off, 0, ni - 1), 0, 0),
        memory_space=pltpu.VMEM)
    full2 = lambda *_: (0, 0)  # noqa: E731
    in_specs = [
        spec(c, -1), spec(c, 0), spec(c, 1),   # x blocks
        spec(c, -1), spec(c, 0), spec(c, 1),   # g blocks
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),    # ln_scale
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),    # ln_bias
        pl.BlockSpec((c, ch), full2, memory_space=pltpu.VMEM),   # w1
        pl.BlockSpec((1, ch), full2, memory_space=pltpu.VMEM),   # b1
        pl.BlockSpec((3, 3, 1, ch), lambda *_: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),                   # wdw
        pl.BlockSpec((1, ch), full2, memory_space=pltpu.VMEM),   # bdw
        pl.BlockSpec((ch, c), full2, memory_space=pltpu.VMEM),   # w2
    ]
    out_shape = (
        jax.ShapeDtypeStruct((b, h, w, c), x.dtype),      # dx
        jax.ShapeDtypeStruct((1, c), jnp.float32),        # dln_scale
        jax.ShapeDtypeStruct((1, c), jnp.float32),        # dln_bias
        jax.ShapeDtypeStruct((c, ch), jnp.float32),       # dw1
        jax.ShapeDtypeStruct((1, ch), jnp.float32),       # db1
        jax.ShapeDtypeStruct((9, ch), jnp.float32),       # dwdw
        jax.ShapeDtypeStruct((1, ch), jnp.float32),       # dbdw
        jax.ShapeDtypeStruct((ch, c), jnp.float32),       # dw2
        jax.ShapeDtypeStruct((1, c), jnp.float32),        # db2
    )
    acc2 = lambda shape: pl.BlockSpec(shape, lambda bi, ii: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    out_specs = (
        pl.BlockSpec((1, rows, w, c), lambda bi, ii: (bi, ii, 0, 0),
                     memory_space=pltpu.VMEM),
        acc2((1, c)), acc2((1, c)), acc2((c, ch)), acc2((1, ch)),
        acc2((9, ch)), acc2((1, ch)), acc2((ch, c)), acc2((1, c)),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b, ni),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(x, x, x, g, g, g, ln_scale.reshape(1, c), ln_bias.reshape(1, c),
      w1, b1.reshape(1, ch), wdw, bdw.reshape(1, ch), w2)
    dx, dlns, dlnb, dw1, db1, dwdw, dbdw, dw2, db2 = outs
    return (dx, dlns.reshape(c), dlnb.reshape(c), dw1, db1.reshape(ch),
            dwdw.reshape(3, 3, 1, ch), dbdw.reshape(ch), dw2, db2.reshape(c))


def _leff_bwd2d_kernel(x_refs, g_refs, lns_ref, lnb_ref, w1_ref, b1_ref,
                       wdw_ref, bdw_ref, w2_ref, dx_ref, dlns_ref, dlnb_ref,
                       dw1_ref, db1_ref, dwdw_ref, dbdw_ref, dw2_ref, db2_ref,
                       *, rows: int, wb: int, c: int, ch: int,
                       compute_dtype: str) -> None:
    """Column-blocked variant of `_leff_bwd_kernel`: 2-D (row, col) grid with
    a +-2 halo in BOTH dimensions assembled from the 3x3 neighbor blocks.
    Same math; used for shapes whose full-width strips cannot hold >= 2 rows
    in VMEM (the model's decoder layers, W=160/Ch=512 and W=80/Ch=1024)."""
    cdtype = jnp.dtype(compute_dtype)
    bi = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    ni = pl.num_programs(1)
    nj = pl.num_programs(2)
    f32 = jnp.float32

    def assemble(refs):
        """3x3 blocks -> [rows+4, wb+4, C] (+-2 halo both dims)."""
        slabs = []
        for oi in range(3):
            left, mid, right = refs[oi * 3:oi * 3 + 3]
            slabs.append(jnp.concatenate(
                [left[0][:, wb - 2:wb], mid[0], right[0][:, 0:2]], axis=1))
        full = jnp.concatenate(slabs, axis=0)  # [3*rows, wb+4, C]
        return full[rows - 2:2 * rows + 2]

    def edge_mask(a, halo_r, halo_c):
        """Zero rows/cols that fall outside the image (conv zero-padding)."""
        hr = a.shape[0]
        hc = a.shape[1]
        r = lax.broadcasted_iota(jnp.int32, (hr, 1, 1), 0)
        cc = lax.broadcasted_iota(jnp.int32, (1, hc, 1), 1)
        ok = (((r >= halo_r) | (i > 0))
              & ((r < hr - halo_r) | (i < ni - 1))
              & ((cc >= halo_c) | (j > 0))
              & ((cc < hc - halo_c) | (j < nj - 1)))
        return jnp.where(ok, a, 0)

    # --- recompute the forward on the block with a 2-cell halo ---
    x = assemble(x_refs)  # [rows+4, wb+4, C]
    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    inv = lax.rsqrt(var + _LN_EPS)
    xhat = (xf - mu) * inv
    lns = lns_ref[...].astype(f32)
    y = (xhat * lns + lnb_ref[...].astype(f32)).astype(cdtype)

    y2 = y.reshape((rows + 4) * (wb + 4), c)
    w1 = w1_ref[...].astype(cdtype)
    z1 = (jnp.dot(y2, w1, preferred_element_type=f32)
          + b1_ref[...].astype(f32))
    h1 = jax.nn.gelu(z1).reshape(rows + 4, wb + 4, ch)
    h1 = edge_mask(h1, 2, 2)

    # depthwise pre-activation on interior + 1-cell halo: [rows+2, wb+2, Ch]
    wdw = wdw_ref[...].astype(f32)
    z2 = jnp.broadcast_to(bdw_ref[...].astype(f32), (rows + 2, wb + 2, ch))
    for ky in range(3):
        for kx in range(3):
            z2 = z2 + h1[ky:ky + rows + 2, kx:kx + wb + 2] * wdw[ky, kx, 0]
    h2 = jax.nn.gelu(z2)

    # --- incoming gradient with a 1-cell halo ---
    g = assemble(g_refs)[1:rows + 3, 1:wb + 3].astype(cdtype)
    g = edge_mask(g, 1, 1)

    # dense2 backward
    g2 = g.reshape((rows + 2) * (wb + 2), c)
    w2 = w2_ref[...].astype(cdtype)
    dh2 = jnp.dot(g2, w2.T, preferred_element_type=f32).reshape(
        rows + 2, wb + 2, ch)
    _, gelu_vjp2 = jax.vjp(jax.nn.gelu, z2)
    dz2 = gelu_vjp2(dh2)[0]

    g_int = g[1:rows + 1, 1:wb + 1].reshape(rows * wb, c)
    h2_int = h2[1:rows + 1, 1:wb + 1].reshape(rows * wb, ch).astype(cdtype)
    dz2_int = dz2[1:rows + 1, 1:wb + 1]

    # depthwise backward (halo available in both dims — no padding needed)
    dh1 = jnp.zeros((rows, wb, ch), f32)
    dwdw_rows = []
    for ky in range(3):
        for kx in range(3):
            dh1 = dh1 + dz2[2 - ky:2 - ky + rows,
                            2 - kx:2 - kx + wb] * wdw[ky, kx, 0]
            taps = h1[1 + ky:1 + ky + rows, 1 + kx:1 + kx + wb] * dz2_int
            dwdw_rows.append(jnp.sum(taps.reshape(rows * wb, ch), axis=0,
                                     keepdims=True))
    dwdw_acc = jnp.concatenate(dwdw_rows, axis=0)  # [9, Ch]

    # gelu backward through dense1 (interior cells)
    z1_int = z1.reshape(rows + 4, wb + 4, ch)[2:rows + 2,
                                              2:wb + 2].reshape(rows * wb, ch)
    _, gelu_vjp1 = jax.vjp(jax.nn.gelu, z1_int)
    dz1 = gelu_vjp1(dh1.reshape(rows * wb, ch))[0]

    # dense1 backward
    y_int = y.reshape(rows + 4, wb + 4, c)[2:rows + 2,
                                           2:wb + 2].reshape(rows * wb, c)
    dy = jnp.dot(dz1.astype(cdtype), w1.T,
                 preferred_element_type=f32).reshape(rows, wb, c)

    # LayerNorm backward (interior cells)
    xhat_i = xhat.reshape(rows + 4, wb + 4, c)[2:rows + 2, 2:wb + 2]
    inv_i = inv.reshape(rows + 4, wb + 4, 1)[2:rows + 2, 2:wb + 2]
    dxh = dy * lns
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat_i, axis=-1, keepdims=True)
    dx = inv_i * (dxh - m1 - xhat_i * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when((bi == 0) & (i == 0) & (j == 0))
    def _init():
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dwdw_ref[...] = jnp.zeros_like(dwdw_ref)
        dbdw_ref[...] = jnp.zeros_like(dbdw_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    rowsum = lambda a2: jnp.sum(a2, axis=0, keepdims=True)  # noqa: E731
    dlns_ref[...] += rowsum((dy * xhat_i).reshape(rows * wb, c))
    dlnb_ref[...] += rowsum(dy.reshape(rows * wb, c))
    dw1_ref[...] += jnp.dot(y_int.T, dz1.astype(cdtype),
                            preferred_element_type=f32)
    db1_ref[...] += rowsum(dz1)
    dwdw_ref[...] += dwdw_acc
    dbdw_ref[...] += rowsum(dz2_int.reshape(rows * wb, ch))
    dw2_ref[...] += jnp.dot(h2_int.T, g_int.astype(f32),
                            preferred_element_type=f32)
    db2_ref[...] += rowsum(g_int.astype(f32))


def _pallas_backward_2d(cfg: _LeffStatic, x, g, ln_scale, ln_bias, w1, b1,
                        wdw, bdw, w2, rows: int, wb: int):
    b, h, w, c = x.shape
    ch = w1.shape[1]
    ni, nj = h // rows, w // wb

    def kernel(*refs, **kw):
        x_refs = refs[0:9]
        g_refs = refs[9:18]
        rest = refs[18:]
        return _leff_bwd2d_kernel(x_refs, g_refs, *rest, rows=rows, wb=wb,
                                  c=c, ch=ch,
                                  compute_dtype=cfg.compute_dtype)

    def spec(oi, oj):
        return pl.BlockSpec(
            (1, rows, wb, c),
            lambda bi, ii, jj, _oi=oi, _oj=oj: (
                bi, jnp.clip(ii + _oi, 0, ni - 1),
                jnp.clip(jj + _oj, 0, nj - 1), 0),
            memory_space=pltpu.VMEM)

    full2 = lambda *_: (0, 0)  # noqa: E731
    nine = [spec(oi, oj) for oi in (-1, 0, 1) for oj in (-1, 0, 1)]
    in_specs = nine + nine + [
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),    # ln_scale
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),    # ln_bias
        pl.BlockSpec((c, ch), full2, memory_space=pltpu.VMEM),   # w1
        pl.BlockSpec((1, ch), full2, memory_space=pltpu.VMEM),   # b1
        pl.BlockSpec((3, 3, 1, ch), lambda *_: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),                   # wdw
        pl.BlockSpec((1, ch), full2, memory_space=pltpu.VMEM),   # bdw
        pl.BlockSpec((ch, c), full2, memory_space=pltpu.VMEM),   # w2
    ]
    out_shape = (
        jax.ShapeDtypeStruct((b, h, w, c), x.dtype),      # dx
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((c, ch), jnp.float32),
        jax.ShapeDtypeStruct((1, ch), jnp.float32),
        jax.ShapeDtypeStruct((9, ch), jnp.float32),
        jax.ShapeDtypeStruct((1, ch), jnp.float32),
        jax.ShapeDtypeStruct((ch, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
    )
    acc2 = lambda shape: pl.BlockSpec(shape, lambda bi, ii, jj: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    out_specs = (
        pl.BlockSpec((1, rows, wb, c), lambda bi, ii, jj: (bi, ii, jj, 0),
                     memory_space=pltpu.VMEM),
        acc2((1, c)), acc2((1, c)), acc2((c, ch)), acc2((1, ch)),
        acc2((9, ch)), acc2((1, ch)), acc2((ch, c)), acc2((1, c)),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b, ni, nj),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(*([x] * 9), *([g] * 9), ln_scale.reshape(1, c), ln_bias.reshape(1, c),
      w1, b1.reshape(1, ch), wdw, bdw.reshape(1, ch), w2)
    dx, dlns, dlnb, dw1, db1, dwdw, dbdw, dw2, db2 = outs
    return (dx, dlns.reshape(c), dlnb.reshape(c), dw1, db1.reshape(ch),
            dwdw.reshape(3, 3, 1, ch), dbdw.reshape(ch), dw2, db2.reshape(c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfg: _LeffStatic, x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2):
    return _pallas_forward(cfg, x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2)


def _pallas_bwd_shape(cfg: _LeffStatic, x, w1) -> bool:
    """Dispatch policy (measured on v5e, B=8 SwinGroups): full-width row
    strips win even at 2 rows (d64@160: pallas 14.3 vs XLA 17.0 f+b/group;
    d128@80: 5.06 vs 5.23), but when the VMEM budget forces COLUMN blocking
    the tiny haloed blocks lose (d128@160: 49.1 vs 40.3; d256@80: 28.2 vs
    19.9) — those shapes take the saved-residual XLA path instead; the
    column-blocked 2-D kernel remains an explicit opt-in for tests."""
    rows, wb = _pick_bwd_blocks(x.shape[1], x.shape[2], w1.shape[1])
    return cfg.use_pallas_bwd and rows >= 2 and wb == x.shape[2]


def _fused_fwd(cfg, *args):
    x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2 = args
    if _pallas_bwd_shape(cfg, x, w1):
        return _pallas_forward(cfg, *args), (args, None, None)
    # saved-residual XLA path: run the reference forward ONCE, keeping the
    # two pre-activations; the backward then never re-runs the forward
    # (the old vjp(leff_reference) fallback paid a full duplicate forward
    # inside the backward — measured 6.6 ms bwd vs 1.5 ms fwd at d128@160).
    # Under no differentiation the primal `_fused` still runs the Pallas
    # forward kernel.
    out, (z1, z2) = _xla_fwd_residuals(
        *args, compute_dtype=jnp.dtype(cfg.compute_dtype))
    if cfg.residual:
        out = x + out
    return out, (args, z1, z2)


def _fused_bwd(cfg, residuals, g):
    args, z1, z2 = residuals
    x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2 = args
    if z1 is None:
        grads = _pallas_backward(cfg, x, g, ln_scale, ln_bias, w1, b1,
                                 wdw, bdw, w2)
        (dx, dlns, dlnb, dw1, db1, dwdw, dbdw, dw2, db2) = grads
    else:
        (dx, dlns, dlnb, dw1, db1, dwdw, dbdw, dw2, db2) = \
            _xla_bwd_from_residuals(
                x, g, ln_scale, ln_bias, w1, wdw, w2, z1, z2,
                compute_dtype=jnp.dtype(cfg.compute_dtype))
    if cfg.residual:  # y = x + f(x) -> dx gains the incoming cotangent
        dx = dx + g.astype(dx.dtype)
    return (dx, dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dwdw.astype(wdw.dtype), dbdw.astype(bdw.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_leff(x: Array, ln_scale: Array, ln_bias: Array, w1: Array,
               b1: Array, wdw: Array, bdw: Array, w2: Array, b2: Array, *,
               compute_dtype=jnp.float32,
               interpret: bool | None = None,
               use_pallas_bwd: bool | None = None,
               residual: bool = False) -> Array:
    """Fused norm2 + LeFF on `[B, H, W, C]`.

    With `residual=True` the kernel outputs `x + branch` (the skip add runs
    in VMEM on the already-loaded strip instead of a separate HBM pass —
    valid whenever the layer's drop_path is the identity).

    Falls back to the XLA reference when the height doesn't divide into row
    strips. `use_pallas_bwd` defaults to compiled-mode only: interpreting
    the backward kernel block-by-block on CPU is pathologically slow, and
    its math is pinned by dedicated tests that opt in explicitly.
    """
    b, h, w, c = x.shape
    ch = w1.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_pallas_bwd is None:
        use_pallas_bwd = not interpret
    rows = _pick_fwd_rows(h, w, c, ch,
                          hbytes=jnp.dtype(compute_dtype).itemsize)
    if rows is None:
        out = leff_reference(x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2,
                             compute_dtype=compute_dtype)
        return x + out if residual else out
    cfg = _LeffStatic(compute_dtype=jnp.dtype(compute_dtype).name,
                      rows=rows, interpret=bool(interpret),
                      use_pallas_bwd=bool(use_pallas_bwd),
                      residual=bool(residual))
    return _fused(cfg, x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2)
