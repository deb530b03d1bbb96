"""Candidate optimizations for the fused window-attention kernel, measured.

Round-4 follow-on to scripts/measure_swin_rates.py: that script localizes
where the SwinGroup cycles go; this one times *rewrites* of the attention
core against the production kernel at every flagship group shape and checks
them bit-for-bit against `window_attention_reference` first (CPU interpret
mode runs the same code path).

Core variants (the per-head stage between QKV and the out-projection):

  loop    — production: static Python loop over heads, per-head lane slices
            q2[:, i*dh:(i+1)*dh]; h dot_generals for logits + h for AV; a
            softmax call per head.  [ops/attention_pallas._attn_block_math]
  fold4d  — one 4-D dot_general with TWO batch dims (gb, h): q/k/v arranged
            [gb, h, n, dh] via an in-VMEM transpose; single softmax over the
            [gb, h, n, n] logits; one AV dot; one transpose back.
  stack3d — heads folded into the leading batch dim: [h*gb, n, dh] (3-D
            dot_general, known-good Mosaic shape); otherwise as fold4d.

Both rewrites do the same FLOPs as `loop` — they trade h small dispatches +
h softmaxes for one big one plus two relayouts. Whether that wins depends on
Mosaic's lowering of the transposes and the tiny-matmul pipeline overheads;
that is exactly what this script measures.

Usage:
    python scripts/measure_swin_variants.py check      # CPU parity
    python scripts/measure_swin_variants.py time       # TPU timings
    python scripts/measure_swin_variants.py time enc0  # one group
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from measure_swin_rates import (  # noqa: E402
    B, WS, N, CDTYPE, GROUPS, _attn_args, attn_gflops, time_fn)

from fbanet_tpu.ops.attention_pallas import (  # noqa: E402
    _LN_EPS, fused_window_attention_2d, window_attention_reference,
    _partition)


def _core_loop(q2, kv2, bias, *, h, dh, n, c, gb, cdtype,
               late_norm=False):
    dn = (((2,), (2,)), ((0,), (0,)))
    dn_av = (((2,), (1,)), ((0,), (0,)))
    outs = []
    for i in range(h):
        qh = q2[:, i * dh:(i + 1) * dh].reshape(gb, n, dh)
        kh = kv2[:, i * dh:(i + 1) * dh].reshape(gb, n, dh)
        vh = kv2[:, c + i * dh:c + (i + 1) * dh].reshape(gb, n, dh)
        attn = jax.lax.dot_general(qh, kh, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
        attn = attn + bias[i][None]
        if late_norm:
            # softmax division deferred past the AV matmul: the row factor
            # 1/sum distributes over the contraction, so dividing the
            # [gb, n, dh] output is exact and n/dh x cheaper than dividing
            # the [gb, n, n] probabilities
            m = jnp.max(attn, axis=-1, keepdims=True)
            e = jnp.exp(attn - m)
            sinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            oh = jax.lax.dot_general(e.astype(cdtype), vh,
                                     dimension_numbers=dn_av,
                                     preferred_element_type=jnp.float32)
            oh = oh * sinv
        else:
            attn = jax.nn.softmax(attn, axis=-1).astype(cdtype)
            oh = jax.lax.dot_general(attn, vh, dimension_numbers=dn_av,
                                     preferred_element_type=jnp.float32)
        outs.append(oh.astype(cdtype).reshape(gb * n, dh))
    return outs[0] if h == 1 else jnp.concatenate(outs, axis=-1)


def _core_fold4d(q2, kv2, bias, *, h, dh, n, c, gb, cdtype):
    q4 = q2.reshape(gb, n, h, dh).transpose(0, 2, 1, 3)  # [gb, h, n, dh]
    k4 = kv2[:, :c].reshape(gb, n, h, dh).transpose(0, 2, 1, 3)
    v4 = kv2[:, c:].reshape(gb, n, h, dh).transpose(0, 2, 1, 3)
    dn = (((3,), (3,)), ((0, 1), (0, 1)))
    attn = jax.lax.dot_general(q4, k4, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)
    attn = attn + bias[None]
    attn = jax.nn.softmax(attn, axis=-1).astype(cdtype)
    dn_av = (((3,), (2,)), ((0, 1), (0, 1)))
    o4 = jax.lax.dot_general(attn, v4, dimension_numbers=dn_av,
                             preferred_element_type=jnp.float32)
    return o4.astype(cdtype).transpose(0, 2, 1, 3).reshape(gb * n, c)


def _stack_chunk(h: int, gb: int, cap: int = 64) -> int:
    """Heads per stacked dot: largest divisor of h with chunk*gb <= cap.
    Full stacking at h=16/gb>=10 OOM'd scoped VMEM (23.5 MB > 16 MB) — the
    lane-padded [h*gb, n, dh->128] q/k/v stacks plus the f32 logits scale
    with chunk*gb, so bound that product like the window picker does."""
    for cand in range(h, 0, -1):
        if h % cand == 0 and cand * gb <= cap:
            return cand
    return 1


def _core_stack3d(q2, kv2, bias, *, h, dh, n, c, gb, cdtype,
                  late_norm=False, chunk=None):
    # Mosaic cannot shape-cast the lane dim into (h, dh) — "infer-vector-
    # layout: unsupported shape cast" — so heads are stacked with the same
    # per-head lane slices the production loop uses, concatenated along the
    # LEADING axis (a supported relayout). One dot_general per chunk of
    # `chunk` heads then replaces 2*chunk tiny dots, one softmax replaces
    # `chunk`.
    hg = _stack_chunk(h, gb) if chunk is None else chunk
    dn = (((2,), (2,)), ((0,), (0,)))
    dn_av = (((2,), (1,)), ((0,), (0,)))

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
        # bias [h, n, n] broadcasts per head over the gb-major stacking;
        # nonzero-offset leading slices lower to an unsupported gather, so
        # integer-index a pre-split view instead
        attn = (attn.reshape(hg, gb, n, n)
                + bias.reshape(h // hg, hg, n, n)[i0 // hg][:, None]
                ).reshape(hg * gb, n, n)
        if late_norm:
            m = jnp.max(attn, axis=-1, keepdims=True)
            e = jnp.exp(attn - m)
            sinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            o3 = jax.lax.dot_general(e.astype(cdtype), v3,
                                     dimension_numbers=dn_av,
                                     preferred_element_type=jnp.float32)
            o3 = (o3 * sinv).astype(cdtype)
        else:
            p = jax.nn.softmax(attn, axis=-1).astype(cdtype)
            o3 = jax.lax.dot_general(p, v3, dimension_numbers=dn_av,
                                     preferred_element_type=jnp.float32)
            o3 = o3.astype(cdtype)  # [hg*gb, n, dh]
        outs.extend(o3[i * gb:(i + 1) * gb].reshape(gb * n, dh)
                    for i in range(hg))
    return outs[0] if h == 1 else jnp.concatenate(outs, axis=-1)


def _core_lanepack(q2, kv2, bias_pair, *, h, dh, n, c, gb, cdtype):
    """Adjacent heads paired along the LANE axis, late-normalized softmax.

    The stack3d logits are [*, n, n] f32 with n = 64 — every elementwise op
    on them (bias/mask add, max, exp-subtract, sum) runs on half-filled
    128-lane vregs. Pairing heads (2m, 2m+1) makes the tiles [*, n, 2n]
    (2n = 128, full lanes), halving the VPU work of the softmax stage that
    the ablations put at ~half the multi-head kernels' time.

    The pair's logits come from ONE dot via a block-diagonal key stack:
    with Kb = [[k_a, 0], [0, k_b]] (2n rows, 2dh lanes),
    [q_a | q_b] @ Kb^T = [q_a k_a^T | q_b k_b^T] exactly (the zero blocks
    add exact f32 zeros). Same trick for AV with Vb. The paired q/k/v
    slices are lane-CONTIGUOUS in q2/kv2 (heads 2m, 2m+1 adjacent), so
    packing costs two lane-masked selects per operand, not a relayout; the
    segmented max/sum use static lane slices. `bias_pair` arrives
    pre-packed [h/2, n, 2n] (built in XLA outside the kernel, where it
    fuses with the bias gather). Requires h even and hg even."""
    assert h % 2 == 0
    hg = _stack_chunk(h, gb)
    if hg % 2:
        hg = 2  # h even => 2 | h; lanepack VMEM/slot <= stack3d's
    hp = hg // 2
    dn = (((2,), (2,)), ((0,), (0,)))     # contract the 2dh lane dim
    dn_av = (((2,), (1,)), ((0,), (0,)))  # contract e's 2n lanes w/ Vb rows
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * dh), 2)
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * n), 2)
    zero = jnp.zeros((), cdtype)

    def stack_pairs(a2, off, i0):  # lane-contiguous pairs -> [hp*gb, n, 2dh]
        parts = [a2[:, off + (i0 + 2 * p) * dh:off + (i0 + 2 * p + 2) * dh]
                 .reshape(gb, n, 2 * dh) for p in range(hp)]
        return parts[0] if hp == 1 else jnp.concatenate(parts, axis=0)

    def blockdiag(a3):  # [P, n, 2dh] -> [[a_lo, 0], [0, a_hi]] as [P, 2n, 2dh]
        return jnp.concatenate([jnp.where(lane_k < dh, a3, zero),
                                jnp.where(lane_k >= dh, a3, zero)], axis=1)

    outs = []
    for i0 in range(0, h, hg):
        qp = stack_pairs(q2, 0, i0)
        kb = blockdiag(stack_pairs(kv2, 0, i0))
        vb = blockdiag(stack_pairs(kv2, c, i0))
        logits = jax.lax.dot_general(qp, kb, dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
        logits = (logits.reshape(hp, gb, n, 2 * n)
                  + bias_pair.reshape(h // hg, hp, n, 2 * n)[i0 // hg][:, None]
                  ).reshape(hp * gb, n, 2 * n)
        m_a = jnp.max(logits[..., :n], axis=-1, keepdims=True)
        m_b = jnp.max(logits[..., n:], axis=-1, keepdims=True)
        e = jnp.exp(logits - jnp.where(lane_l < n, m_a, m_b))
        s_a = jnp.sum(e[..., :n], axis=-1, keepdims=True)
        s_b = jnp.sum(e[..., n:], axis=-1, keepdims=True)
        o3 = jax.lax.dot_general(e.astype(cdtype), vb,
                                 dimension_numbers=dn_av,
                                 preferred_element_type=jnp.float32)
        o3 = o3 * jnp.where(lane_k < dh, 1.0 / s_a, 1.0 / s_b)
        o3 = o3.astype(cdtype)  # [hp*gb, n, 2dh], heads (2m, 2m+1) in lanes
        outs.extend(o3[p * gb:(p + 1) * gb].reshape(gb * n, 2 * dh)
                    for p in range(hp))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def pack_bias_pairs(bias: "jnp.ndarray") -> "jnp.ndarray":
    """[h, n, n] -> [h/2, n, 2n]: row m = [bias[2m] | bias[2m+1]]."""
    return jnp.concatenate([bias[0::2], bias[1::2]], axis=-1)


# fold4d (two batch dims) does NOT lower on Mosaic: "tpu.matmul op Not
# implemented: Up to 1 batch dim supported" — kept above for the record,
# excluded from CORES.
import functools as _ft

CORES = {
    "loop": _core_loop,
    "stack3d": _core_stack3d,
    "loop_ln": _ft.partial(_core_loop, late_norm=True),
    "stack3d_ln": _ft.partial(_core_stack3d, late_norm=True),
    "lanepack": _core_lanepack,  # needs pre-packed bias + even heads
}


def _var_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
                wproj_ref, bproj_ref, bias_ref, out_ref, *, heads, n, c, ws,
                nwr, nr, core, qkv1=False):
    cdtype = CDTYPE
    h, dh = heads, c // heads
    scale = dh ** -0.5
    gb = nr * nwr
    x4 = x_ref[0]
    xw = x4.reshape(nr, ws, nwr, ws, c).transpose(0, 2, 1, 3, 4).reshape(
        gb, n, c)

    xf = xw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + _LN_EPS) * lns_ref[...].astype(jnp.float32)
    y = ((xf - mu) * mul + lnb_ref[...].astype(jnp.float32)).astype(cdtype)

    y2 = y.reshape(gb * n, c)
    if qkv1:
        # single [C, 3C] matmul: q | k | v in one MXU pass
        wqkv = jnp.concatenate([wq_ref[...], wkv_ref[...]], axis=1)
        bqkv = jnp.concatenate([bq_ref[...], bkv_ref[...]], axis=1)
        qkv = (jnp.dot(y2, wqkv.astype(cdtype),
                       preferred_element_type=jnp.float32)
               + bqkv.astype(jnp.float32))
        q2 = (qkv[:, :c] * scale).astype(cdtype)
        kv2 = qkv[:, c:].astype(cdtype)
    else:
        q2 = (jnp.dot(y2, wq_ref[...].astype(cdtype),
                      preferred_element_type=jnp.float32)
              + bq_ref[...].astype(jnp.float32)) * scale
        kv2 = (jnp.dot(y2, wkv_ref[...].astype(cdtype),
                       preferred_element_type=jnp.float32)
               + bkv_ref[...].astype(jnp.float32))
        q2 = q2.astype(cdtype)
        kv2 = kv2.astype(cdtype)

    o2 = CORES[core](q2, kv2, bias_ref[...], h=h, dh=dh, n=n, c=c, gb=gb,
                     cdtype=cdtype)

    out = (jnp.dot(o2, wproj_ref[...].astype(cdtype),
                   preferred_element_type=jnp.float32)
           + bproj_ref[...].astype(jnp.float32))
    out = out.reshape(gb, n, c)
    out4 = out.reshape(nr, nwr, ws, ws, c).transpose(0, 2, 1, 3, 4)
    out_ref[0] = out4.reshape(nr * ws, nwr * ws, c).astype(out_ref.dtype)


def variant_attention(c, res, heads, core: str, *, qkv1=False,
                      nr_override=None):
    """Mask-free 2-D attention with a selectable core implementation."""
    nwr = nh = res // WS
    nr = 1
    for cand in range(nh, 0, -1):
        if nh % cand:
            continue
        vmem = (cand * WS * res * c * 4 * 7 + cand * nwr * N * N * 4 * 3)
        if cand * nwr <= 64 and vmem <= 6 * 2**20:
            nr = cand
            break
    if nr_override is not None:
        assert nh % nr_override == 0
        nr = nr_override

    kernel = functools.partial(_var_kernel, heads=heads, n=N, c=c, ws=WS,
                               nwr=nwr, nr=nr, core=core, qkv1=qkv1)
    full2 = lambda *_: (0, 0)  # noqa: E731
    packed = core == "lanepack"
    bias_shape = (heads // 2, N, 2 * N) if packed else (heads, N, N)

    def call(x4, lns, lnb, wq, bq, wkv, bkv, wproj, bproj, bias):
        if packed:
            bias = pack_bias_pairs(bias)
        in_specs = [
            pl.BlockSpec((1, nr * WS, res, c), lambda bi, ii: (bi, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_shape, lambda bi, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kernel,
            grid=(x4.shape[0], nh // nr),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, nr * WS, res, c),
                                   lambda bi, ii: (bi, ii, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x4.shape, x4.dtype),
            interpret=jax.default_backend() != "tpu",
        )(x4, lns.reshape(1, c), lnb.reshape(1, c), wq, bq.reshape(1, c),
          wkv, bkv.reshape(1, 2 * c), wproj, bproj.reshape(1, c),
          bias.astype(jnp.float32))

    return call


# ---------------------------------------------------------------------------
# LeFF variants: the ablation table shows the 9-tap depthwise loop at 30-55%
# of LeFF time (near the f32 VPU roofline) and the two GELUs at ~20-40% for
# the narrow-channel groups. Both currently run in f32; the VPU can pack
# bf16 2x/lane on newer TPUs — these variants measure whether that packing
# is real on this chip. Numerics note: `leff_reference` itself computes the
# conv and GELUs in the compute dtype (bf16 matmul outputs), so the bf16
# variants sit BETWEEN the production kernel (f32 acc, more precise than the
# reference) and the reference semantics.
# ---------------------------------------------------------------------------

def _leff_var_kernel(xp_ref, xc_ref, xn_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                     wdw_ref, bdw_ref, w2_ref, b2_ref, out_ref, *, rows, w, c,
                     ch, dw_bf16, gelu_bf16):
    cdtype = CDTYPE
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    x = jnp.concatenate([xp_ref[0, rows - 1:rows], xc_ref[0],
                         xn_ref[0, 0:1]], axis=0)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + _LN_EPS) * lns_ref[...].astype(jnp.float32)
    y = ((xf - mu) * mul + lnb_ref[...].astype(jnp.float32)).astype(cdtype)

    y2 = y.reshape((rows + 2) * w, c)
    z1 = (jnp.dot(y2, w1_ref[...].astype(cdtype),
                  preferred_element_type=jnp.float32)
          + b1_ref[...].astype(jnp.float32))
    if gelu_bf16:
        h1 = jax.nn.gelu(z1.astype(cdtype))
    else:
        h1 = jax.nn.gelu(z1).astype(cdtype)
    h1 = h1.reshape(rows + 2, w, ch)

    r = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    valid = ((r > 0) | (i > 0)) & ((r < rows + 1) | (i < ni - 1))
    h1 = jnp.where(valid, h1, jnp.zeros((), cdtype))

    h1p = jnp.pad(h1, ((0, 0), (1, 1), (0, 0)))
    adtype = cdtype if dw_bf16 else jnp.float32
    acc = jnp.broadcast_to(bdw_ref[...].astype(adtype), (rows, w, ch))
    for ky in range(3):
        for kx in range(3):
            tap = wdw_ref[ky, kx].astype(adtype)
            acc = acc + h1p[ky:ky + rows, kx:kx + w].astype(adtype) * tap
    if gelu_bf16:
        h2 = jax.nn.gelu(acc.astype(cdtype))
    else:
        h2 = jax.nn.gelu(acc.astype(jnp.float32)).astype(cdtype)

    out = (jnp.dot(h2.reshape(rows * w, ch), w2_ref[...].astype(cdtype),
                   preferred_element_type=jnp.float32)
           + b2_ref[...].astype(jnp.float32)).reshape(rows, w, c)
    out_ref[0] = out.astype(out_ref.dtype)


def variant_leff(c, res, *, dw_bf16=False, gelu_bf16=False):
    from fbanet_tpu.ops.leff_pallas import _pick_fwd_rows
    ch = 4 * c
    rows = _pick_fwd_rows(res, res, c, ch, hbytes=2)
    assert rows is not None and res % rows == 0
    ni = res // rows
    kernel = functools.partial(_leff_var_kernel, rows=rows, w=res, c=c, ch=ch,
                               dw_bf16=dw_bf16, gelu_bf16=gelu_bf16)
    xspec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, rows, res, c),
        lambda bi, ii, _off=off: (bi, jnp.clip(ii + _off, 0, ni - 1), 0, 0),
        memory_space=pltpu.VMEM)
    full2 = lambda *_: (0, 0)  # noqa: E731

    def call(x, lns, lnb, w1, b1, wdw, bdw, w2, b2):
        in_specs = [
            xspec(-1), xspec(0), xspec(1),
            pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ch), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 1, ch), lambda *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kernel,
            grid=(x.shape[0], ni),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, rows, res, c),
                                   lambda bi, ii: (bi, ii, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=jax.default_backend() != "tpu",
        )(x, x, x, lns.reshape(1, c), lnb.reshape(1, c), w1,
          b1.reshape(1, ch), wdw, bdw.reshape(1, ch), w2, b2.reshape(1, c))

    return call


LEFF_VARIANTS = {
    "dwbf16": dict(dw_bf16=True),
    "gelubf16": dict(gelu_bf16=True),
    "bothbf16": dict(dw_bf16=True, gelu_bf16=True),
}


def check_leff(groups) -> None:
    """Report each LeFF variant's deviation from the production kernel and
    from the XLA reference (which is itself bf16-conv, i.e. *between* the
    two). These variants trade precision for VPU packing — the check prints
    magnitudes; adoption is a measured decision, not a bit-parity one."""
    from fbanet_tpu.ops.leff_pallas import leff_reference
    from measure_swin_rates import _leff_args
    for name, c, res, _heads in groups:
        args = _leff_args(c, res)
        x = args[0][:2]
        rest = args[1:]
        prod = variant_leff(c, res)(x, *rest)
        ref = leff_reference(x, *rest, compute_dtype=CDTYPE)
        rdiff = float(jnp.max(jnp.abs(prod.astype(jnp.float32)
                                      - ref.astype(jnp.float32))))
        print(f"leff {name} prod vs XLA-ref: {rdiff:.3e}", flush=True)
        for vname, kw in LEFF_VARIANTS.items():
            out = variant_leff(c, res, **kw)(x, *rest)
            d_prod = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                           - prod.astype(jnp.float32))))
            d_ref = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                          - ref.astype(jnp.float32))))
            print(f"leff {name} {vname:9s}: vs prod {d_prod:.3e}  "
                  f"vs ref {d_ref:.3e}", flush=True)
            assert d_prod <= 0.05, (name, vname, d_prod)


def check(groups) -> None:
    """CPU interpret-mode parity: every variant must be bit-identical to the
    production `loop` core (which itself matches the XLA reference to bf16
    rounding — the kernel accumulates QKV in f32 where the reference matmuls
    emit bf16, so reference parity is tolerance-based in the test suite)."""
    for name, c, res, heads in groups:
        args = _attn_args(c, res, heads)
        x4 = args[0][:2]  # 2 images are enough for parity
        rest = args[1:]
        oracle = variant_attention(c, res, heads, "loop")(x4, *rest)
        ref_w = window_attention_reference(
            _partition(x4, WS), *rest, None, heads=heads,
            compute_dtype=CDTYPE)
        from fbanet_tpu.ops.attention_pallas import _reverse
        ref = _reverse(ref_w, WS, x4.shape[0], res, res)
        rdiff = float(jnp.max(jnp.abs(oracle.astype(jnp.float32)
                                      - ref.astype(jnp.float32))))
        print(f"check {name} loop vs XLA-ref: {rdiff:.3e} (bf16 rounding)",
              flush=True)
        cores = ["stack3d", "loop_ln", "stack3d_ln"]
        if heads % 2 == 0:
            cores.append("lanepack")
        for core in cores:
            out = variant_attention(c, res, heads, core)(x4, *rest)
            diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                         - oracle.astype(jnp.float32))))
            # different dot_general shapes reduce in different orders and
            # late_norm moves the softmax division past the AV matmul, so a
            # bf16 probability can round differently — allow two
            # output-scale bf16 LSBs (outputs are O(1); at/below the
            # loop-vs-reference gap above)
            scale = float(jnp.max(jnp.abs(oracle.astype(jnp.float32))))
            tol = max(4e-3, 2 * 2.0**-8 * scale)  # 2 bf16 LSBs at out scale
            status = "OK" if diff <= tol else f"DIFF {diff:.3e}"
            print(f"check {name} {core:10s}: {status} ({diff:.1e}, "
                  f"tol {tol:.1e})", flush=True)
            assert diff <= tol, (name, core, diff)


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    mode = argv[0] if argv else "check"
    sel = set(argv[1:])
    groups = [g for g in GROUPS if not sel or g[0] in sel]

    print(f"backend={jax.default_backend()} B={B} dtype=bfloat16", flush=True)
    if mode == "check":
        check(groups)
        check_leff(groups)
        return

    if mode in ("time", "time-attn"):
        for name, c, res, heads in groups:
            args = _attn_args(c, res, heads)
            gf = attn_gflops(c, res)
            fn_prod = functools.partial(
                fused_window_attention_2d, mask=None, heads=heads,
                window_size=WS, compute_dtype=CDTYPE)
            time_fn(f"var/{name} prod", fn_prod, args, gf)
            for core in CORES:
                if core == "lanepack" and heads % 2:
                    continue
                time_fn(f"var/{name} {core:10s}", variant_attention(
                    c, res, heads, core), args, gf)
            time_fn(f"var/{name} ln+qkv1", variant_attention(
                c, res, heads, "stack3d_ln", qkv1=True), args, gf)
            if res == 160 and c == 64:
                time_fn(f"var/{name} ln+nr2", variant_attention(
                    c, res, heads, "stack3d_ln", nr_override=2), args, gf)

    if mode in ("time", "time-leff"):
        from measure_swin_rates import _leff_args, leff_gflops
        for name, c, res, _heads in groups:
            args = _leff_args(c, res)
            gf = leff_gflops(c, res)
            time_fn(f"leffvar/{name} prod", variant_leff(c, res), args, gf)
            for vname, kw in LEFF_VARIANTS.items():
                time_fn(f"leffvar/{name} {vname:9s}",
                        variant_leff(c, res, **kw), args, gf)


if __name__ == "__main__":
    main()
