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


def _leff_kernel(xp_ref, xc_ref, xn_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                 wdw_ref, bdw_ref, w2_ref, b2_ref, out_ref, *, rows: int,
                 w: int, c: int, ch: int, compute_dtype: str) -> None:
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

    # Dense C -> Ch + GELU on strip + halo rows
    y2 = y.reshape((rows + 2) * w, c)
    h1 = jax.nn.gelu(
        jnp.dot(y2, w1_ref[...].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b1_ref[...].astype(jnp.float32))
    h1 = h1.reshape(rows + 2, w, ch)

    # zero the halo rows at image boundaries (the conv zero-pads there)
    r = lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    valid = ((r > 0) | (i > 0)) & ((r < rows + 1) | (i < ni - 1))
    h1 = jnp.where(valid, h1, 0.0)

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
           + b2_ref[...].astype(jnp.float32))
    out_ref[0] = out.astype(out_ref.dtype).reshape(rows, w, c)


def _pallas_forward(cfg: _LeffStatic, x, ln_scale, ln_bias, w1, b1, wdw, bdw,
                    w2, b2):
    b, h, w, c = x.shape
    ch = w1.shape[1]
    rows = cfg.rows
    assert h % rows == 0, (h, rows)
    ni = h // rows

    kernel = functools.partial(_leff_kernel, rows=rows, w=w, c=c, ch=ch,
                               compute_dtype=cfg.compute_dtype)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfg: _LeffStatic, x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2):
    return _pallas_forward(cfg, x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2)


def _fused_fwd(cfg, *args):
    return _pallas_forward(cfg, *args), args


def _fused_bwd(cfg, residuals, g):
    ref = functools.partial(leff_reference,
                            compute_dtype=jnp.dtype(cfg.compute_dtype))
    _, vjp = jax.vjp(lambda *a: ref(*a), *residuals)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_leff(x: Array, ln_scale: Array, ln_bias: Array, w1: Array,
               b1: Array, wdw: Array, bdw: Array, w2: Array, b2: Array, *,
               compute_dtype=jnp.float32,
               interpret: bool | None = None) -> Array:
    """Fused norm2 + LeFF on `[B, H, W, C]` (pre-residual output).

    Falls back to the XLA reference when the height doesn't divide into row
    strips.
    """
    b, h, w, c = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if h % _ROWS != 0:
        return leff_reference(x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2,
                              compute_dtype=compute_dtype)
    cfg = _LeffStatic(compute_dtype=jnp.dtype(compute_dtype).name,
                      rows=_ROWS, interpret=bool(interpret))
    return _fused(cfg, x, ln_scale, ln_bias, w1, b1, wdw, bdw, w2, b2)
