"""Fused Pallas forward for the FAF affinity gate.

The gate stage (reference: fba_net/blocks/federated_affinity_fusion.py:67-108
after the exact cancellation documented in models/blocks.py) is

    s_k   = sum_c (x_k  *3x3* wsum)      per-pixel scalar affinity
    gate  = sigmoid(|s_k - s_0|)         (frame 0 ungated)
    out_k = x_k * gate_k

— pure bandwidth over the [B, F, H, W, C] burst (367 MB bf16 at the
published size). The XLA form (depthwise conv + lane reduce + fused
elementwise) materializes the depthwise map and the gate in HBM; this
kernel computes everything on VMEM-resident strips: one read of x, one
read of the frame-0 slab per frame, one write.

Backward: jax.custom_vjp with the XLA reference as the vjp — the
depthwise-form backward is layout-sane (no C_out=1 wgrad), and the gate's
parameter gradient flows through `wsum` (the caller reduces it onto the
full [3,3,C,C] kernel).

Dispatch: `fused_affinity_gate(..., impl="auto")` resolves to the Pallas
kernel on TPU and the XLA reference elsewhere, mirroring the other fused
kernels; `ModelConfig.gate_impl` / `FAFBlock.gate_impl` select it per
model (default "xla" until the kernel is TPU-measured faster). Shapes
whose strips don't fit the VMEM budget fall back to the XLA form.
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

_ROWS = 40  # strip height (divisor of every production H: 160, 80, 40)


def gate_reference(x: Array, wsum: Array,
                   compute_dtype=jnp.bfloat16) -> Array:
    """XLA form: depthwise conv + lane reduction + fused elementwise.

    x: [B, F, H, W, C]; wsum: [3, 3, C] (channel-summed embedding kernel).
    """
    b, f, h, w, c = x.shape
    cdtype = jnp.dtype(compute_dtype)
    xd = x.astype(cdtype)
    wdep = wsum[:, :, None, :].astype(cdtype)  # [3, 3, 1, C]
    dn = lax.conv_dimension_numbers((b * f, h, w, c), wdep.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    z = lax.conv_general_dilated(xd.reshape(b * f, h, w, c), wdep, (1, 1),
                                 [(1, 1), (1, 1)], dimension_numbers=dn,
                                 feature_group_count=c)
    # f32 channel reduction: the C_out=1 conv this form replaced accumulated
    # in f32 on the MXU; a bf16 lane-sum would add ~1e-2 drift that the
    # |s_k - s_0| cancellation amplifies (and would diverge from the Pallas
    # kernel's f32 accumulator).
    s = jnp.sum(z, axis=-1, dtype=jnp.float32).reshape(b, f, h, w)
    delta = jnp.abs(s - s[:, :1])[..., None]
    gate = jax.nn.sigmoid(delta).astype(cdtype)
    fidx = jnp.arange(f).reshape(1, f, 1, 1, 1)
    gate = jnp.where(fidx == 0, jnp.ones((), cdtype), gate)
    return xd * gate


def _strip_affinity(xp, xc, xn, wsum, rows, w, i, ni):
    """Channel-summed 3x3 affinity of one strip (+-1-row halo blocks).

    Returns s [rows, W, 1] f32. Out-of-image halo rows contribute zeros
    (the conv zero-pads)."""
    x = jnp.concatenate([xp[rows - 1:rows], xc, xn[0:1]], axis=0)
    r = lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    valid = ((r > 0) | (i > 0)) & ((r < rows + 1) | (i < ni - 1))
    x = jnp.where(valid, x, jnp.zeros((), x.dtype))
    xw = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))           # [rows+2, W+2, C]
    acc = jnp.zeros((rows, w, x.shape[-1]), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            # wsum block is [3, 3, 1, C] so each tap stays 2-D ([1, C]) —
            # Mosaic does not lower rank-1 values (CLAUDE.md)
            tap = wsum[ky, kx].astype(jnp.float32)
            acc = acc + xw[ky:ky + rows, kx:kx + w] * tap
    return jnp.sum(acc, axis=-1, keepdims=True)         # [rows, W, 1] f32


def _gate_kernel(xp_ref, xc_ref, xn_ref, x0p_ref, x0c_ref, x0n_ref, w_ref,
                 out_ref, *, rows: int, w: int,
                 compute_dtype: str) -> None:
    cdtype = jnp.dtype(compute_dtype)
    fi = pl.program_id(1)
    i = pl.program_id(2)
    ni = pl.num_programs(2)
    wsum = w_ref[...]  # [3, 3, 1, C] f32 (small, revisited)

    s = _strip_affinity(xp_ref[0].astype(cdtype), xc_ref[0].astype(cdtype),
                        xn_ref[0].astype(cdtype), wsum, rows, w, i, ni)
    s0 = _strip_affinity(x0p_ref[0].astype(cdtype), x0c_ref[0].astype(cdtype),
                         x0n_ref[0].astype(cdtype), wsum, rows, w, i, ni)
    gate = jax.nn.sigmoid(jnp.abs(s - s0))               # [rows, W, 1] f32
    gate = jnp.where(fi == 0, jnp.ones((), jnp.float32), gate)
    out_ref[0] = (xc_ref[0].astype(cdtype) * gate.astype(cdtype)).astype(
        out_ref.dtype)


class _GateStatic(NamedTuple):
    compute_dtype: str
    interpret: bool


def _pick_gate_rows(h: int, w: int, c: int, xbytes: int,
                    vmem_budget: int = 10 * 2**20) -> int | None:
    """Largest strip height (divisor of h, <= _ROWS) whose block set fits
    VMEM: 7 (rows, W, C) x-dtype blocks (x_k/x_0 triples + out) plus two
    f32 padded strips + accumulator per affinity pass. None -> XLA form."""
    for rows in range(min(_ROWS, h), 0, -1):
        if h % rows:
            continue
        est = (7 * rows * w * c * xbytes
               + 2 * (rows + 2) * (w + 2) * c * 4   # padded strip copies
               + rows * w * c * 4)                  # f32 accumulator
        if est <= vmem_budget:
            return rows
    return None


def _pallas_gate(cfg: _GateStatic, x: Array, wsum: Array, rows: int) -> Array:
    b, f, h, w, c = x.shape
    ni = h // rows
    x4 = x.reshape(b * f, h, w, c)
    x0 = x[:, 0]  # [B, H, W, C]

    kernel = functools.partial(_gate_kernel, rows=rows, w=w,
                               compute_dtype=cfg.compute_dtype)

    def spec_k(off):
        return pl.BlockSpec(
            (1, rows, w, c),
            lambda bi, fi, ii, _o=off: (bi * f + fi, jnp.clip(ii + _o, 0,
                                                              ni - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def spec_0(off):
        return pl.BlockSpec(
            (1, rows, w, c),
            lambda bi, fi, ii, _o=off: (bi, jnp.clip(ii + _o, 0, ni - 1),
                                        0, 0),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(b, f, ni),
        in_specs=[spec_k(-1), spec_k(0), spec_k(1),
                  spec_0(-1), spec_0(0), spec_0(1),
                  pl.BlockSpec((3, 3, 1, c), lambda *_: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, rows, w, c),
            lambda bi, fi, ii: (bi * f + fi, ii, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * f, h, w, c),
                                       jnp.dtype(cfg.compute_dtype)),
        interpret=cfg.interpret,
    )(x4, x4, x4, x0, x0, x0,
      wsum.reshape(3, 3, 1, c).astype(jnp.float32))
    return out.reshape(b, f, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _fused(cfg: _GateStatic, x, wsum, rows: int):
    return _pallas_gate(cfg, x, wsum, rows)


def _fused_fwd(cfg, x, wsum, rows):
    return _pallas_gate(cfg, x, wsum, rows), (x, wsum)


def _fused_bwd(cfg, rows, residuals, g):
    x, wsum = residuals
    ref = functools.partial(gate_reference,
                            compute_dtype=jnp.dtype(cfg.compute_dtype))
    _, vjp = jax.vjp(ref, x, wsum)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_affinity_gate(x: Array, wsum: Array, *,
                        compute_dtype=jnp.bfloat16,
                        impl: str = "auto",
                        interpret: bool | None = None) -> Array:
    """Gated burst `x * sigmoid(|s_k - s_0|)` (frame 0 ungated).

    x: [B, F, H, W, C]; wsum: [3, 3, C]. impl: 'auto' = Pallas on TPU /
    XLA elsewhere; 'xla' / 'pallas' force a path. Shapes whose strips
    don't fit VMEM fall back to the XLA form.
    """
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown gate impl {impl!r}")
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    rows = _pick_gate_rows(x.shape[2], x.shape[3], x.shape[4],
                           jnp.dtype(compute_dtype).itemsize)
    if impl == "xla" or rows is None:
        return gate_reference(x, wsum, compute_dtype=compute_dtype)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cfg = _GateStatic(compute_dtype=jnp.dtype(compute_dtype).name,
                      interpret=bool(interpret))
    return _fused(cfg, x, wsum, rows)
