"""Fused Pallas TPU window-attention kernel.

One SwinLayer attention branch — LayerNorm -> QKV projection -> scaled
multi-head attention with relative-position bias (+ optional shift mask) ->
output projection — executed as a single Pallas kernel over blocks of
windows. The XLA path materializes ~a dozen HBM-sized intermediates per layer
(LN output, q/k/v, f32 attention logits, softmax, per-head outputs, ...);
here everything after the window partition lives in VMEM, and the QKV/proj
matmuls run at full width so the MXU sees [GB*N, C] x [C, C] shapes.

Semantics match fbanet_tpu.models.layers.WindowAttention (+ its preceding
norm1 LayerNorm) exactly; `window_attention_reference` below is the
line-for-line XLA restatement used as the custom-VJP backward rule and the
parity oracle in tests. The reference model computed this per window with a
vmapped Equinox module (fba_net/layers/fba_net.py:195-249,
fba_net/layers/window_attention.py); the fusion itself has no reference
counterpart — it is the TPU-native design for SURVEY.md §8 hard-part #5.

Layout notes (Mosaic):
- windows arrive pre-partitioned as [G, N, C] (G = batch * windows/image,
  N = window_size**2); the partition/reverse reshapes stay in XLA where they
  fuse with the surrounding roll/residual ops.
- [GB, N, C] -> [GB*N, C] merges are layout-free because N % 8 == 0;
  per-head lane slices use static offsets; all matmuls set
  preferred_element_type=f32.
- LayerNorm/softmax are computed in f32 regardless of the compute dtype,
  mirroring the flax modules (scale folded into rsqrt *before* the multiply,
  fast-variance clamped at 0, eps 1e-5 — the torch default, for import
  fidelity with published checkpoints).

Backward: jax.custom_vjp with the forward running the kernel and the
backward differentiating `window_attention_reference` — identical math, so
gradients are exact while training forwards get the fused kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_LN_EPS = 1e-5  # torch nn.LayerNorm default — matches models/layers._LN_EPS


class _AttnStatic(NamedTuple):
    """Hashable static config for the custom_vjp."""

    heads: int
    windows_per_image: int  # mask periodicity along the window axis
    compute_dtype: str  # "float32" | "bfloat16"
    block_windows: int
    interpret: bool
    use_pallas_bwd: bool = True


def _supported(n: int, c: int, heads: int) -> bool:
    """Shapes the kernel lowers cleanly for (everything else -> XLA path)."""
    return n % 8 == 0 and c % heads == 0 and (c // heads) % 8 == 0


def pick_block_windows(n_windows: int, n: int, c: int, *,
                       vmem_budget: int = 6 * 2**20) -> int:
    """Largest divisor of `n_windows` whose block fits the VMEM budget.

    The mask BlockSpec indexes blocks modulo (windows_per_image /
    block_windows), so the block size must divide the per-image window count.
    """
    # per-window VMEM bytes: x/y/q2/kv2(x2)/o2/out live concurrently in f32
    # (~7 n*c buffers) plus attention logits + softmax temporaries
    per_window = n * c * 4 * 7 + n * n * 4 * 3
    cap = max(1, vmem_budget // per_window)
    best = 1
    for d in range(1, min(n_windows, 64) + 1):
        if n_windows % d == 0 and d <= cap:
            best = d
    return best


# --------------------------------------------------------------------------
# XLA reference (the exact math of norm1 + WindowAttention, as functions of
# explicit parameter arrays) — backward rule and parity oracle.
# --------------------------------------------------------------------------

def window_attention_reference(x: Array, ln_scale: Array, ln_bias: Array,
                               wq: Array, bq: Array, wkv: Array, bkv: Array,
                               wproj: Array, bproj: Array, bias: Array,
                               mask: Array | None, *, heads: int,
                               compute_dtype=jnp.float32) -> Array:
    """[G, N, C] pre-norm windows -> [G, N, C] attention branch output.

    Mirrors models/layers.py (norm1 -> WindowAttention with linear token
    projection, no dropout, no SE) with parameters passed explicitly.
    `bias` is the gathered relative-position bias [heads, N, N];
    `mask` is the per-window shift mask [nW, N, N] or None.
    """
    g, n, c = x.shape
    h = heads
    dh = c // h
    cdtype = jnp.dtype(compute_dtype)

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + _LN_EPS) * ln_scale.astype(jnp.float32)
    y = ((xf - mu) * mul + ln_bias.astype(jnp.float32)).astype(cdtype)

    q = y @ wq.astype(cdtype) + bq.astype(cdtype)
    kv = y @ wkv.astype(cdtype) + bkv.astype(cdtype)
    k, v = jnp.split(kv, 2, axis=-1)

    q = q.reshape(g, n, h, dh).transpose(0, 2, 1, 3) * (dh ** -0.5)
    k = k.reshape(g, n, h, dh).transpose(0, 2, 1, 3)
    v = v.reshape(g, n, h, dh).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(g // nw, nw, h, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(g, h, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(cdtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(g, n, c)
    out = out @ wproj.astype(cdtype) + bproj.astype(cdtype)
    return out.astype(x.dtype)


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------

def _stack_chunk(h: int, gb: int, cap: int = 64) -> int:
    """Heads per stacked attention dot: largest divisor of `h` with
    chunk*gb <= cap. Stacking batches the per-head [gb, n, dh] dots into one
    dot_general with batch chunk*gb and merges chunk softmaxes into one, but
    the lane-padded q/k/v stacks (dh -> 128 lanes) and the f32 logits scale
    with chunk*gb — full stacking at h=16/gb=10 overflowed scoped VMEM
    (23.5 MB > 16 MB, measured), so the product is bounded like the window
    picker's."""
    for cand in range(h, 0, -1):
        if h % cand == 0 and cand * gb <= cap:
            return cand
    return 1


def _attn_block_math(x, lns, lnb, wq, bq, wkv, bkv, wproj, bproj, bias,
                     mask, *, heads: int, n: int, c: int, gb: int,
                     cdtype) -> Array:
    """The shared in-VMEM attention math: LN -> QKV -> multi-head attention
    with bias (+mask) -> out projection. x: [GB, N, C] -> [GB, N, C].

    The head stage stacks chunks of heads along the leading (batch) axis —
    Mosaic cannot shape-cast the lane dim into (h, dh), so heads are sliced
    from the lanes (as the original per-head loop did) and concatenated
    leading-dim — and defers the softmax division past the AV matmul: the
    row factor 1/sum distributes over the contraction, so scaling the
    [*, N, dh] output is exact and N/dh x cheaper than dividing the
    [*, N, N] probabilities. Measured on v5e (B=8 flagship shapes,
    scripts/measure_swin_variants.py): -16% (enc0/h1) to -48% (bott/h16)
    per-kernel vs the per-head-loop/jax.nn.softmax form; the in-kernel
    ablation run put the per-head softmax at ~half the multi-head kernels'
    time (docs/ROUND4.md §6b)."""
    h, dh = heads, c // heads
    scale = dh ** -0.5

    # --- LayerNorm (f32, flax semantics) ---
    xf = x.astype(jnp.float32)  # [GB, N, C]
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + _LN_EPS) * lns.astype(jnp.float32)
    y = ((xf - mu) * mul + lnb.astype(jnp.float32)).astype(cdtype)

    # --- full-width QKV projections (big MXU matmuls) ---
    y2 = y.reshape(gb * n, c)
    q2 = (jnp.dot(y2, wq.astype(cdtype),
                  preferred_element_type=jnp.float32)
          + bq.astype(jnp.float32)) * scale
    kv2 = (jnp.dot(y2, wkv.astype(cdtype),
                   preferred_element_type=jnp.float32)
           + bkv.astype(jnp.float32))
    q2 = q2.astype(cdtype)
    kv2 = kv2.astype(cdtype)

    # --- chunk-stacked heads, late-normalized softmax ---
    hg = _stack_chunk(h, gb)
    dn = (((2,), (2,)), ((0,), (0,)))  # batch stacked dim, contract dh
    dn_av = (((2,), (1,)), ((0,), (0,)))  # contract key dim of [*, N, N]

    def stack(a2, off, i0):  # lane slices -> [hg*gb, n, dh]
        parts = [a2[:, off + i * dh:off + (i + 1) * dh].reshape(gb, n, dh)
                 for i in range(i0, i0 + hg)]
        return parts[0] if hg == 1 else jnp.concatenate(parts, axis=0)

    outs = []
    for i0 in range(0, h, hg):
        q3 = stack(q2, 0, i0)
        k3 = stack(kv2, 0, i0)
        v3 = stack(kv2, c, i0)
        attn = jax.lax.dot_general(q3, k3, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
        # bias [h, n, n] is per head; mask [gb, n, n] per window of the
        # gb-major stacking. NB: leading-dim slices with a nonzero offset
        # (bias[i0:i0+hg]) lower to an unsupported ">2D gather" in Mosaic —
        # integer indexing into a pre-split [h//hg, hg, n, n] view does not.
        attn4 = (attn.reshape(hg, gb, n, n)
                 + bias.reshape(h // hg, hg, n, n)[i0 // hg][:, None])
        if mask is not None:
            attn4 = attn4 + mask[None]
        attn = attn4.reshape(hg * gb, n, n)
        m = jnp.max(attn, axis=-1, keepdims=True)
        e = jnp.exp(attn - m)
        sinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        o3 = jax.lax.dot_general(e.astype(cdtype), v3,
                                 dimension_numbers=dn_av,
                                 preferred_element_type=jnp.float32)
        o3 = (o3 * sinv).astype(cdtype)
        outs.extend(o3[i * gb:(i + 1) * gb].reshape(gb * n, dh)
                    for i in range(hg))

    o2 = outs[0] if h == 1 else jnp.concatenate(outs, axis=-1)  # [GB*N, C]
    out = (jnp.dot(o2, wproj.astype(cdtype),
                   preferred_element_type=jnp.float32)
           + bproj.astype(jnp.float32))
    return out.reshape(gb, n, c)


def _attention_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wkv_ref,
                      bkv_ref, wproj_ref, bproj_ref, bias_ref, *rest,
                      heads: int, n: int, c: int, gb: int, has_mask: bool,
                      compute_dtype: str) -> None:
    if has_mask:
        mask_ref, out_ref = rest
    else:
        (out_ref,) = rest
    out = _attn_block_math(
        x_ref[...], lns_ref[...], lnb_ref[...], wq_ref[...], bq_ref[...],
        wkv_ref[...], bkv_ref[...], wproj_ref[...], bproj_ref[...],
        bias_ref[...], mask_ref[...] if has_mask else None,
        heads=heads, n=n, c=c, gb=gb, cdtype=jnp.dtype(compute_dtype))
    out_ref[...] = out.astype(out_ref.dtype)


def _attention2d_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wkv_ref,
                        bkv_ref, wproj_ref, bproj_ref, bias_ref, *rest,
                        heads: int, n: int, c: int, ws: int, nwr: int,
                        nr: int, has_mask: bool, compute_dtype: str,
                        residual: bool = False) -> None:
    """Partition-fused variant: one grid step = `nr` rows of windows of one
    image, read directly as a (1, nr*ws, W, C) block of the 4-D feature map
    — the HBM-materialized [G, N, C] window tensor (and its reverse) never
    exists. The window split/merge is an in-VMEM leading-dim transpose."""
    if has_mask:
        mask_ref, out_ref = rest
    else:
        (out_ref,) = rest
    gb = nr * nwr
    x4 = x_ref[0]  # [nr*ws, W, C]
    xw = x4.reshape(nr, ws, nwr, ws, c).transpose(0, 2, 1, 3, 4).reshape(
        gb, n, c)
    out = _attn_block_math(
        xw, lns_ref[...], lnb_ref[...], wq_ref[...], bq_ref[...],
        wkv_ref[...], bkv_ref[...], wproj_ref[...], bproj_ref[...],
        bias_ref[...], mask_ref[...] if has_mask else None,
        heads=heads, n=n, c=c, gb=gb, cdtype=jnp.dtype(compute_dtype))
    out4 = out.reshape(nr, nwr, ws, ws, c).transpose(0, 2, 1, 3, 4)
    out4 = out4.reshape(nr * ws, nwr * ws, c)
    if residual:  # x4 is already in VMEM — the skip add is free here
        out4 = out4 + x4.astype(out4.dtype)
    out_ref[0] = out4.astype(out_ref.dtype)


def _pallas_forward(cfg: _AttnStatic, x, ln_scale, ln_bias, wq, bq, wkv, bkv,
                    wproj, bproj, bias, mask):
    g, n, c = x.shape
    gb = cfg.block_windows
    assert g % gb == 0, (g, gb)
    has_mask = mask is not None
    if has_mask:
        assert cfg.windows_per_image % gb == 0

    # biases as [1, D] rows (Mosaic wants rank >= 2)
    kernel = functools.partial(
        _attention_kernel, heads=cfg.heads, n=n, c=c, gb=gb,
        has_mask=has_mask, compute_dtype=cfg.compute_dtype)

    full = lambda *_: (0,) * 2  # weights/biases: one block, constant
    in_specs = [
        pl.BlockSpec((gb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), full, memory_space=pltpu.VMEM),   # ln_scale
        pl.BlockSpec((1, c), full, memory_space=pltpu.VMEM),   # ln_bias
        pl.BlockSpec((c, c), full, memory_space=pltpu.VMEM),   # wq
        pl.BlockSpec((1, c), full, memory_space=pltpu.VMEM),   # bq
        pl.BlockSpec((c, 2 * c), full, memory_space=pltpu.VMEM),  # wkv
        pl.BlockSpec((1, 2 * c), full, memory_space=pltpu.VMEM),  # bkv
        pl.BlockSpec((c, c), full, memory_space=pltpu.VMEM),   # wproj
        pl.BlockSpec((1, c), full, memory_space=pltpu.VMEM),   # bproj
        pl.BlockSpec((cfg.heads, n, n), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),                 # rel-pos bias
    ]
    args = [x,
            ln_scale.reshape(1, c), ln_bias.reshape(1, c),
            wq, bq.reshape(1, c), wkv, bkv.reshape(1, 2 * c),
            wproj, bproj.reshape(1, c), bias.astype(jnp.float32)]
    if has_mask:
        nwb = cfg.windows_per_image // gb
        in_specs.append(pl.BlockSpec((gb, n, n), lambda i, _nwb=nwb: (i % _nwb, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(g // gb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gb, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, c), x.dtype),
        interpret=cfg.interpret,
    )(*args)


# --------------------------------------------------------------------------
# Backward kernel — windows are independent, so each block recomputes its
# forward and produces its dx plus partial parameter gradients that
# accumulate in constant-index output blocks across the sequential grid.
# --------------------------------------------------------------------------

def _attention_bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, wq_ref, bq_ref,
                          wkv_ref, bkv_ref, wproj_ref, bias_ref, *rest,
                          heads: int, n: int, c: int, gb: int,
                          has_mask: bool, compute_dtype: str,
                          hg_cap: int = 32) -> None:
    if has_mask:
        mask_ref = rest[0]
        outs_refs = rest[1:]
    else:
        outs_refs = rest
    (dx_ref, dlns_ref, dlnb_ref, dwq_ref, dbq_ref, dwkv_ref, dbkv_ref,
     dwproj_ref, dbproj_ref, dbias_ref) = outs_refs
    cdtype = jnp.dtype(compute_dtype)
    f32 = jnp.float32
    h, dh = heads, c // heads
    scale = dh ** -0.5
    i = pl.program_id(0)

    # --- recompute forward ---
    xf = x_ref[...].astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (xf - mu) * inv
    lns = lns_ref[...].astype(f32)
    y = (xhat * lns + lnb_ref[...].astype(f32)).astype(cdtype)
    y2 = y.reshape(gb * n, c)
    wq = wq_ref[...].astype(cdtype)
    wkv = wkv_ref[...].astype(cdtype)
    q2 = (jnp.dot(y2, wq, preferred_element_type=f32)
          + bq_ref[...].astype(f32)) * scale
    kv2 = (jnp.dot(y2, wkv, preferred_element_type=f32)
           + bkv_ref[...].astype(f32))
    q2c = q2.astype(cdtype)
    kv2c = kv2.astype(cdtype)

    dn_qk = (((2,), (2,)), ((0,), (0,)))   # [gb,n,dh] x [gb,n,dh] -> [gb,n,n]
    dn_av = (((2,), (1,)), ((0,), (0,)))   # [gb,n,n] x [gb,n,dh] -> [gb,n,dh]
    dn_t = (((1,), (1,)), ((0,), (0,)))    # contract the out-token dim

    g2 = g_ref[...].astype(cdtype).reshape(gb * n, c)
    wproj = wproj_ref[...].astype(cdtype)
    do2 = jnp.dot(g2, wproj.T, preferred_element_type=f32)  # [gb*n, C]

    # Heads are processed in stacked chunks, like the forward (_attn_block_
    # math): per-head [gb, n, dh] operands concatenate along the leading
    # axis so each chunk runs ONE dot_general per algebraic step (6 total)
    # and one softmax instead of per-head ones. The backward holds ~5 live
    # [hg*gb, n, n] f32 buffers (logits/e/p/dp/dlogits), so its chunk cap is
    # half the forward's (and 16 at c=256, measured -9% — see
    # _pallas_backward's budget table).
    hg = _stack_chunk(h, gb, cap=hg_cap)

    def stack(a2, off, i0, dtype):  # lane slices -> [hg*gb, n, dh]
        parts = [a2[:, off + j * dh:off + (j + 1) * dh].astype(dtype)
                 .reshape(gb, n, dh) for j in range(i0, i0 + hg)]
        return parts[0] if hg == 1 else jnp.concatenate(parts, axis=0)

    bias4 = bias_ref[...].reshape(h // hg, hg, n, n)
    o_heads = []
    dq_heads = []
    dk_heads = []
    dv_heads = []
    dbias_new = []
    for i0 in range(0, h, hg):
        q3 = stack(q2c, 0, i0, cdtype)
        k3 = stack(kv2c, 0, i0, cdtype)
        v3 = stack(kv2c, c, i0, cdtype)
        logits = jax.lax.dot_general(q3, k3, dimension_numbers=dn_qk,
                                     preferred_element_type=f32)
        logits4 = logits.reshape(hg, gb, n, n) + bias4[i0 // hg][:, None]
        if has_mask:
            logits4 = logits4 + mask_ref[...][None]
        logits = logits4.reshape(hg * gb, n, n)
        # softmax via reciprocal-multiply (the division is the hot op)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
        p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))  # f32
        pc = p.astype(cdtype)
        o3 = jax.lax.dot_general(pc, v3, dimension_numbers=dn_av,
                                 preferred_element_type=f32)

        do3 = stack(do2, 0, i0, cdtype)
        dp = jax.lax.dot_general(do3, v3, dimension_numbers=dn_qk,
                                 preferred_element_type=f32)
        dv3 = jax.lax.dot_general(pc, do3, dimension_numbers=dn_t,
                                  preferred_element_type=f32)
        dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
        dbias_new.extend(dlogits.reshape(hg, gb, n, n).sum(axis=1))
        dlc = dlogits.astype(cdtype)
        dq3 = jax.lax.dot_general(dlc, k3, dimension_numbers=dn_av,
                                  preferred_element_type=f32)
        dk3 = jax.lax.dot_general(dlc, q3, dimension_numbers=dn_t,
                                  preferred_element_type=f32)
        for j in range(hg):
            sl = slice(j * gb, (j + 1) * gb)
            o_heads.append(o3[sl].astype(cdtype).reshape(gb * n, dh))
            dq_heads.append(dq3[sl].reshape(gb * n, dh))
            dk_heads.append(dk3[sl].reshape(gb * n, dh))
            dv_heads.append(dv3[sl].reshape(gb * n, dh))

    o2 = (o_heads[0] if h == 1 else jnp.concatenate(o_heads, axis=-1))
    dq2 = ((dq_heads[0] if h == 1 else jnp.concatenate(dq_heads, axis=-1))
           * scale)  # gradient of (y2@Wq + bq), f32
    dkv2 = jnp.concatenate(
        [dk_heads[0] if h == 1 else jnp.concatenate(dk_heads, axis=-1),
         dv_heads[0] if h == 1 else jnp.concatenate(dv_heads, axis=-1)],
        axis=-1)  # [gb*n, 2C] f32

    dq2c = dq2.astype(cdtype)
    dkv2c = dkv2.astype(cdtype)
    dy2 = (jnp.dot(dq2c, wq.T, preferred_element_type=f32)
           + jnp.dot(dkv2c, wkv.T, preferred_element_type=f32))
    dy = dy2.reshape(gb, n, c)

    # LayerNorm backward
    dxh = dy * lns
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx = inv * (dxh - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        for r in (dlns_ref, dlnb_ref, dwq_ref, dbq_ref, dwkv_ref, dbkv_ref,
                  dwproj_ref, dbproj_ref, dbias_ref):
            r[...] = jnp.zeros_like(r)

    rowsum = lambda a2: jnp.sum(a2, axis=0, keepdims=True)  # noqa: E731
    dlns_ref[...] += rowsum((dy * xhat).reshape(gb * n, c))
    dlnb_ref[...] += rowsum(dy.reshape(gb * n, c))
    dwq_ref[...] += jnp.dot(y2.T, dq2c, preferred_element_type=f32)
    dbq_ref[...] += rowsum(dq2)
    dwkv_ref[...] += jnp.dot(y2.T, dkv2c, preferred_element_type=f32)
    dbkv_ref[...] += rowsum(dkv2)
    dwproj_ref[...] += jnp.dot(o2.T, g2.astype(f32),
                               preferred_element_type=f32)
    dbproj_ref[...] += rowsum(g2.astype(f32))
    for hi in range(h):
        dbias_ref[hi] += dbias_new[hi]


def _pallas_backward(cfg: _AttnStatic, x, g, ln_scale, ln_bias, wq, bq, wkv,
                     bkv, wproj, bias, mask):
    gsz, n, c = x.shape
    has_mask = mask is not None
    h = cfg.heads
    # the backward holds per-head probability/temporary stacks (~3-4x the
    # forward's live VMEM), so pick its own, smaller block size (measured:
    # the forward's block at h=16/c=256 allocates 28 MB in the backward).
    # Width-dependent budgets + head-chunk caps from the r5 on-chip sweep
    # (scripts/measure_bwd.py blocks): c=64 fits 6 MB blocks (gb 10 -> 32,
    # -13%); c=128 fits 4 MB (gb 5 -> 10, -5%); c=256 OOMs beyond 2 MB but
    # prefers hg<=16 head chunks (-9%) — its f32 logits stacks, not the
    # x/g blocks, are the VMEM pressure there.
    if c >= 256:
        budget, hg_cap = 2 * 2**20, 16
    elif c >= 128:
        budget, hg_cap = 4 * 2**20, 32
    else:
        budget, hg_cap = 6 * 2**20, 32
    nw = cfg.windows_per_image if has_mask else gsz
    gb_limit = nw
    while gsz % gb_limit != 0:
        gb_limit -= 1
    gb = pick_block_windows(gb_limit, n, c, vmem_budget=budget)

    kernel = functools.partial(
        _attention_bwd_kernel, heads=h, n=n, c=c, gb=gb, has_mask=has_mask,
        hg_cap=hg_cap, compute_dtype=cfg.compute_dtype)
    full2 = lambda *_: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((gb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 2 * c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, g, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wq,
            bq.reshape(1, c), wkv, bkv.reshape(1, 2 * c), wproj,
            bias.astype(jnp.float32)]
    if has_mask:
        nwb = cfg.windows_per_image // gb
        in_specs.append(pl.BlockSpec(
            (gb, n, n), lambda i, _nwb=nwb: (i % _nwb, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.float32))

    out_shape = (
        jax.ShapeDtypeStruct((gsz, n, c), x.dtype),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((c, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((c, 2 * c), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * c), jnp.float32),
        jax.ShapeDtypeStruct((c, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((h, n, n), jnp.float32),
    )
    acc = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out_specs = (
        pl.BlockSpec((gb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        acc((1, c)), acc((1, c)), acc((c, c)), acc((1, c)),
        acc((c, 2 * c)), acc((1, 2 * c)), acc((c, c)), acc((1, c)),
        acc((h, n, n)),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(gsz // gb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(*args)
    (dx, dlns, dlnb, dwq, dbq, dwkv, dbkv, dwproj, dbproj, dbias) = outs
    return (dx, dlns.reshape(c), dlnb.reshape(c), dwq, dbq.reshape(c),
            dwkv, dbkv.reshape(2 * c), dwproj, dbproj.reshape(c), dbias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfg: _AttnStatic, x, ln_scale, ln_bias, wq, bq, wkv, bkv, wproj,
           bproj, bias, mask):
    return _pallas_forward(cfg, x, ln_scale, ln_bias, wq, bq, wkv, bkv,
                           wproj, bproj, bias, mask)


def _fused_fwd(cfg, *args):
    return _pallas_forward(cfg, *args), args


def _fused_bwd(cfg, residuals, g):
    x, ln_scale, ln_bias, wq, bq, wkv, bkv, wproj, bproj, bias, mask = \
        residuals
    if cfg.use_pallas_bwd:
        (dx, dlns, dlnb, dwq, dbq, dwkv, dbkv, dwproj, dbproj, dbias) = \
            _pallas_backward(cfg, x, g, ln_scale, ln_bias, wq, bq, wkv, bkv,
                             wproj, bias, mask)
        return (dx, dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
                dwq.astype(wq.dtype), dbq.astype(bq.dtype),
                dwkv.astype(wkv.dtype), dbkv.astype(bkv.dtype),
                dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype),
                dbias.astype(bias.dtype),
                None if mask is None else jnp.zeros_like(mask))
    ref = functools.partial(window_attention_reference, heads=cfg.heads,
                            compute_dtype=jnp.dtype(cfg.compute_dtype))
    _, vjp = jax.vjp(lambda *a: ref(*a), *residuals)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# Partition-fused (4-D input) variant
# --------------------------------------------------------------------------


class _Attn2dStatic(NamedTuple):
    heads: int
    window_size: int
    compute_dtype: str
    interpret: bool
    use_pallas_bwd: bool = True
    residual: bool = False  # kernel outputs x + branch (saves one HBM pass)


def _partition(x4: Array, ws: int) -> Array:
    b, h, w, c = x4.shape
    xw = x4.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(b * (h // ws) * (w // ws), ws * ws, c)


def _reverse(win: Array, ws: int, b: int, h: int, w: int) -> Array:
    c = win.shape[-1]
    xw = win.reshape(b, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(b, h, w, c)


def _pallas_forward_2d(cfg: _Attn2dStatic, x4, ln_scale, ln_bias, wq, bq,
                       wkv, bkv, wproj, bproj, bias, mask):
    b, hgt, wid, c = x4.shape
    ws = cfg.window_size
    n = ws * ws
    nwr, nh = wid // ws, hgt // ws
    has_mask = mask is not None

    # rows of windows per grid step: target ~32-64 windows/step for MXU row
    # depth while keeping the x block + per-window math inside VMEM
    nr = 1
    for cand in range(nh, 0, -1):
        if nh % cand:
            continue
        vmem = (cand * ws * wid * c * 4 * 7          # x/y/q/kv/out f32-ish
                + cand * nwr * n * n * 4 * 3)        # logits/softmax temps
        if cand * nwr <= 64 and vmem <= 6 * 2**20:
            nr = cand
            break

    kernel = functools.partial(
        _attention2d_kernel, heads=cfg.heads, n=n, c=c, ws=ws, nwr=nwr,
        nr=nr, has_mask=has_mask, compute_dtype=cfg.compute_dtype,
        residual=cfg.residual)
    full2 = lambda *_: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, nr * ws, wid, c), lambda bi, ii: (bi, ii, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),   # ln_scale
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),   # ln_bias
        pl.BlockSpec((c, c), full2, memory_space=pltpu.VMEM),   # wq
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),   # bq
        pl.BlockSpec((c, 2 * c), full2, memory_space=pltpu.VMEM),  # wkv
        pl.BlockSpec((1, 2 * c), full2, memory_space=pltpu.VMEM),  # bkv
        pl.BlockSpec((c, c), full2, memory_space=pltpu.VMEM),   # wproj
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),   # bproj
        pl.BlockSpec((cfg.heads, n, n), lambda bi, ii: (0, 0, 0),
                     memory_space=pltpu.VMEM),                  # rel-pos bias
    ]
    args = [x4,
            ln_scale.reshape(1, c), ln_bias.reshape(1, c),
            wq, bq.reshape(1, c), wkv, bkv.reshape(1, 2 * c),
            wproj, bproj.reshape(1, c), bias.astype(jnp.float32)]
    if has_mask:
        # mask [nW_img, N, N] row-major: step ii holds windows
        # ii*nr*nwr .. (ii+1)*nr*nwr-1 -> block (nr*nwr, N, N) at index ii
        in_specs.append(pl.BlockSpec(
            (nr * nwr, n, n), lambda bi, ii: (ii, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(b, nh // nr),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nr * ws, wid, c),
                               lambda bi, ii: (bi, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hgt, wid, c), x4.dtype),
        interpret=cfg.interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused2d(cfg: _Attn2dStatic, x4, ln_scale, ln_bias, wq, bq, wkv, bkv,
             wproj, bproj, bias, mask):
    return _pallas_forward_2d(cfg, x4, ln_scale, ln_bias, wq, bq, wkv, bkv,
                              wproj, bproj, bias, mask)


def _fused2d_fwd(cfg, *args):
    return _pallas_forward_2d(cfg, *args), args


def _fused2d_bwd(cfg, residuals, g4):
    """Backward: partition in XLA (training runs under remat anyway), reuse
    the windowed backward machinery, reverse dx."""
    x4, ln_scale, ln_bias, wq, bq, wkv, bkv, wproj, bproj, bias, mask = \
        residuals
    b, hgt, wid, c = x4.shape
    ws = cfg.window_size
    n = ws * ws
    nwpi = (hgt // ws) * (wid // ws)
    xw = _partition(x4, ws)
    gw = _partition(g4, ws)
    gb_limit = nwpi if mask is not None else xw.shape[0]
    while xw.shape[0] % gb_limit != 0:
        gb_limit -= 1
    cfg_w = _AttnStatic(
        heads=cfg.heads, windows_per_image=nwpi,
        compute_dtype=cfg.compute_dtype,
        block_windows=pick_block_windows(gb_limit, n, c),
        interpret=cfg.interpret, use_pallas_bwd=cfg.use_pallas_bwd)
    grads = _fused_bwd(cfg_w, (xw, ln_scale, ln_bias, wq, bq, wkv, bkv,
                               wproj, bproj, bias, mask), gw)
    dxw, *rest = grads
    dx4 = _reverse(dxw, ws, b, hgt, wid)
    if cfg.residual:  # y = x + f(x) -> dx gains the incoming cotangent
        dx4 = dx4 + g4.astype(dx4.dtype)
    return (dx4, *rest)


_fused2d.defvjp(_fused2d_fwd, _fused2d_bwd)


def fused_window_attention_2d(x4: Array, ln_scale: Array, ln_bias: Array,
                              wq: Array, bq: Array, wkv: Array, bkv: Array,
                              wproj: Array, bproj: Array, bias: Array,
                              mask: Array | None, *, heads: int,
                              window_size: int,
                              compute_dtype=jnp.float32,
                              interpret: bool | None = None,
                              use_pallas_bwd: bool | None = None,
                              residual: bool = False) -> Array:
    """Fused norm1 + window attention directly on the 4-D feature map
    `[B, H, W, C]` (post-shift; the caller rolls/unrolls — rolls cost ~0.07
    ms while the partition/reverse HBM materializations this removes cost
    ~0.5 ms per dim-64 layer at B=4). Window partition/merge happen in VMEM
    inside the kernel. Output is the attention branch in image layout; with
    `residual=True` the kernel outputs `x + branch` instead (valid for
    shifted layers too: roll is a permutation, so
    `unroll(roll(x) + branch) = x + unroll(branch)`).
    """
    b, hgt, wid, c = x4.shape
    ws = window_size
    n = ws * ws
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_pallas_bwd is None:
        use_pallas_bwd = not interpret
    if (hgt % ws or wid % ws or not _supported(n, c, heads)):
        win = window_attention_reference(
            _partition(x4, ws), ln_scale, ln_bias, wq, bq, wkv, bkv, wproj,
            bproj, bias, mask, heads=heads, compute_dtype=compute_dtype)
        out = _reverse(win, ws, b, hgt, wid)
        return x4 + out if residual else out
    cfg = _Attn2dStatic(heads=heads, window_size=ws,
                        compute_dtype=jnp.dtype(compute_dtype).name,
                        interpret=bool(interpret),
                        use_pallas_bwd=bool(use_pallas_bwd),
                        residual=bool(residual))
    return _fused2d(cfg, x4, ln_scale, ln_bias, wq, bq, wkv, bkv, wproj,
                    bproj, bias, mask)


def fused_window_attention(x: Array, ln_scale: Array, ln_bias: Array,
                           wq: Array, bq: Array, wkv: Array, bkv: Array,
                           wproj: Array, bproj: Array, bias: Array,
                           mask: Array | None, *, heads: int,
                           windows_per_image: int,
                           compute_dtype=jnp.float32,
                           interpret: bool | None = None,
                           use_pallas_bwd: bool | None = None) -> Array:
    """Fused norm1 + window attention on `[G, N, C]` windows.

    Falls back to the XLA reference automatically for shapes the kernel does
    not support (N not a multiple of 8, head_dim not a multiple of 8).
    `use_pallas_bwd` defaults to compiled-mode only: interpreting the
    backward kernel block-by-block on CPU is pathologically slow, and its
    math is pinned by dedicated tests that opt in explicitly.
    """
    g, n, c = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_pallas_bwd is None:
        use_pallas_bwd = not interpret
    if not _supported(n, c, heads):
        return window_attention_reference(
            x, ln_scale, ln_bias, wq, bq, wkv, bkv, wproj, bproj, bias, mask,
            heads=heads, compute_dtype=compute_dtype)
    nw = windows_per_image if mask is not None else g
    gb_limit = nw
    # the block must also divide the total window count
    while g % gb_limit != 0:
        gb_limit -= 1
    gb = pick_block_windows(gb_limit, n, c)
    cfg = _AttnStatic(heads=heads, windows_per_image=windows_per_image,
                      compute_dtype=jnp.dtype(compute_dtype).name,
                      block_windows=gb, interpret=bool(interpret),
                      use_pallas_bwd=bool(use_pallas_bwd))
    return _fused(cfg, x, ln_scale, ln_bias, wq, bq, wkv, bkv, wproj, bproj,
                  bias, mask)
