"""Backward-pass cycle localization for the fused Swin kernels (VERDICT r4
next #1): the round-4 profile measured the B=8 train step at ~227 ms against
a ~58 ms forward — bwd+optimizer is ~170 ms where the FLOP ratio predicts
~2x the forward. This script repeats the forward's §6b rigor on the
*backward*:

  groups:  per-group, per-kernel fwd-only vs fwd+bwd (value_and_grad w.r.t.
           x AND all parameters) -> bwd-only ms, analytic bwd FLOPs,
           achieved TF/s, and ms at the measured ~59 TF/s conv ceiling.
  ablate:  a parametrized copy of ops/attention_pallas._attention_bwd_kernel
           with stages removable (forward recompute / softmax-bwd / weight
           grads / dx chain / whole per-head core) — full-vs-ablated deltas
           bound where the backward cycles go. Ablations compute the wrong
           values by design; `check` pins the unablated copy bit-close to
           the production backward first.
  blocks:  the production bwd kernel re-built at several VMEM budgets /
           head-chunk caps — is the conservative 2 MB block picker costing
           time?

Analytic backward FLOPs (MACs x 2, per window, N tokens, width c):
  attention fwd:  8*N*c^2 + 4*N^2*c   (qkv 6, proj 2; logits 2, AV 2)
  attention bwd: 22*N*c^2 + 12*N^2*c  (recompute qkv 6; do2 2; dy 6;
                  wgrads y'dq 2 + y'dkv 4 + o'g 2; core: logits 2 + AV 2 +
                  dP 2 + dV 2 + dQ 2 + dK 2)
LeFF bwd FLOPs are reported at the same 22/8 matmul ratio applied to its
matmul share plus 3x its depthwise share (recompute + input-grad + tap-grad
correlations) — an estimate, labeled as such.

Usage:
    python scripts/measure_bwd.py [groups] [ablate] [blocks] [check]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbanet_tpu.ops.attention_pallas import (
    _LN_EPS,
    _stack_chunk,
    pick_block_windows,
    window_attention_reference,
)

B = 8
WS = 8
N = WS * WS
CDTYPE = jnp.bfloat16

GROUPS = [
    ("enc0", 64, 160, 1),
    ("enc1", 128, 80, 2),
    ("bott", 256, 40, 16),
    ("dec0", 256, 80, 16),
    ("dec1", 128, 160, 8),
]

CONV_CEILING_TFS = 59.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def slope(loop_fn, n_lo: int = 10, n_hi: int = 40) -> float:
    t0 = time.time()
    loop_fn(n_lo)
    log(f"  compile: {time.time() - t0:.1f}s")
    t0 = time.time()
    loop_fn(n_lo)
    t_lo = time.time() - t0
    t0 = time.time()
    loop_fn(n_hi)
    t_hi = time.time() - t0
    return (t_hi - t_lo) / (n_hi - n_lo) * 1e3


def attn_fwd_gflops(c: int, res: int) -> float:
    nw = (res // WS) ** 2
    return B * nw * (8 * N * c * c + 4 * N * N * c) / 1e9


def attn_bwd_gflops(c: int, res: int) -> float:
    nw = (res // WS) ** 2
    return B * nw * (22 * N * c * c + 12 * N * N * c) / 1e9


def leff_fwd_gflops(c: int, res: int) -> float:
    ch = 4 * c
    return B * res * res * (4 * c * ch + 18 * ch) / 1e9


def leff_bwd_gflops(c: int, res: int) -> float:
    # estimate: matmul share at the attention 22/8 bwd/fwd ratio, depthwise
    # at 3x (recompute + dinput + dtap correlations)
    ch = 4 * c
    return B * res * res * (4 * c * ch * 22 / 8 + 3 * 18 * ch) / 1e9


def _attn_args(c: int, res: int, heads: int, key=0):
    rng = np.random.default_rng(key)
    u = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    x4 = u(B, res, res, c).astype(CDTYPE)
    return (x4, u(c), u(c), u(c, c), u(c), u(c, 2 * c), u(2 * c),
            u(c, c), u(c), u(heads, N, N))


def _leff_args(c: int, res: int, key=0):
    rng = np.random.default_rng(key)
    u = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    ch = 4 * c
    x = u(B, res, res, c).astype(CDTYPE)
    return (x, u(c), u(c), u(c, ch), u(ch), u(3, 3, 1, ch), u(ch),
            u(ch, c), u(c))


def time_fn(name: str, fn, args, gf: float, x_idx: int = 0,
            n_lo: int = 10, n_hi: int = 40) -> float:
    args = tuple(args)

    @jax.jit
    def loop(a, n):
        def body(_i, acc):
            cur = list(a)
            cur[x_idx] = cur[x_idx] + (acc * 1e-7).astype(cur[x_idx].dtype)
            out = fn(*cur)
            return jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def run(n):
        v = float(loop(args, n))
        assert v == v, "NaN"

    log(f"{name}:")
    ms = slope(run, n_lo, n_hi)
    tf = gf / ms
    print(f"{name:36s} {ms:8.3f} ms  {gf:7.1f} GF  {tf:6.1f} TF/s",
          flush=True)
    return ms


def grad_wrapper(fn, n_args: int):
    """grad of sum(out^2)/2 w.r.t. every argument; returns a flat array so
    the timing loop can mean() it. NOT sum(out): a constant cotangent lets
    XLA constant-fold the linear parts of the backward (measured: enc1
    attention f+b read an impossible 85 TF/s) and even miscompiles the
    depthwise-conv weight grad (kernel shape [8,80,80,1] batch-group-1024
    conv rejected by the TPU compiler). sum(out^2)'s cotangent is the
    output itself — data-dependent, nothing folds."""
    def scalar(*args):
        out = fn(*args).astype(jnp.float32)
        return 0.5 * jnp.sum(out * out)

    g = jax.grad(scalar, argnums=tuple(range(n_args)))

    def run(*args):
        # consume EVERY element of every gradient: returning grads[i][:1]
        # lets XLA dead-code-narrow the backward (observed: the depthwise
        # weight-grad conv sliced to 1 output feature — an invalid conv the
        # compiler then rejected; matmul grads can silently shrink the same
        # way). sum(t*t) cannot be folded through the producing ops.
        grads = g(*args)
        return jnp.stack([jnp.sum(jnp.square(t.astype(jnp.float32)))
                          for t in grads])
    return run


# ---------------------------------------------------------------------------
# Ablation copy of the attention backward kernel
# ---------------------------------------------------------------------------

def _abl_bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, wq_ref, bq_ref,
                    wkv_ref, bkv_ref, wproj_ref, bias_ref, *outs_refs,
                    heads: int, n: int, c: int, gb: int, hg_cap: int,
                    recompute: bool, dsoftmax: bool, wgrads: bool,
                    dxchain: bool, core: bool, merged: bool = False) -> None:
    """Mirror of ops/attention_pallas._attention_bwd_kernel (mask-free) with
    switchable stages. With every switch True the math is identical —
    pinned by `check` against the production backward."""
    (dx_ref, dlns_ref, dlnb_ref, dwq_ref, dbq_ref, dwkv_ref, dbkv_ref,
     dwproj_ref, dbproj_ref, dbias_ref) = outs_refs
    cdtype = CDTYPE
    f32 = jnp.float32
    h, dh = heads, c // heads
    scale = dh ** -0.5
    i = pl.program_id(0)

    xf = x_ref[...].astype(f32)
    if recompute:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1,
                                        keepdims=True) - mu * mu)
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
    else:  # skip LN + qkv recompute: reuse x as stand-ins (wrong values)
        inv = jnp.ones((gb, n, 1), f32)
        xhat = xf
        lns = lns_ref[...].astype(f32)
        y2 = x_ref[...].astype(cdtype).reshape(gb * n, c)
        wq = wq_ref[...].astype(cdtype)
        wkv = wkv_ref[...].astype(cdtype)
        q2c = y2
        kv2c = jnp.concatenate([y2, y2], axis=-1)

    dn_qk = (((2,), (2,)), ((0,), (0,)))
    dn_av = (((2,), (1,)), ((0,), (0,)))
    dn_t = (((1,), (1,)), ((0,), (0,)))

    g2 = g_ref[...].astype(cdtype).reshape(gb * n, c)
    wproj = wproj_ref[...].astype(cdtype)
    do2 = jnp.dot(g2, wproj.T, preferred_element_type=f32)

    hg = _stack_chunk(h, gb, cap=hg_cap)

    def stack(a2, off, i0, dtype):
        parts = [a2[:, off + j * dh:off + (j + 1) * dh].astype(dtype)
                 .reshape(gb, n, dh) for j in range(i0, i0 + hg)]
        return parts[0] if hg == 1 else jnp.concatenate(parts, axis=0)

    if core:
        bias4 = bias_ref[...].reshape(h // hg, hg, n, n)
        o_heads, dq_heads, dk_heads, dv_heads, dbias_new = [], [], [], [], []
        for i0 in range(0, h, hg):
            q3 = stack(q2c, 0, i0, cdtype)
            k3 = stack(kv2c, 0, i0, cdtype)
            v3 = stack(kv2c, c, i0, cdtype)
            do3 = stack(do2, 0, i0, cdtype)
            hgb = hg * gb
            if merged:
                # pairs of same-dimension-number dots fused into one dot at
                # 2x batch: (logits, dp) share dn_qk and have no mutual
                # dependency; after the softmax pair, (o3, dq3) share dn_av
                # and (dv3, dk3) share dn_t with the shared [pc; dlc] lhs.
                # Slicing the doubled outputs uses a pre-split [2, hgb, ...]
                # view (nonzero-offset leading slices lower to unsupported
                # gathers in Mosaic).
                m1 = jax.lax.dot_general(
                    jnp.concatenate([q3, do3], axis=0),
                    jnp.concatenate([k3, v3], axis=0),
                    dimension_numbers=dn_qk, preferred_element_type=f32)
                m1v = m1.reshape(2, hgb, n, n)
                logits, dp = m1v[0], m1v[1]
            else:
                logits = jax.lax.dot_general(q3, k3, dimension_numbers=dn_qk,
                                             preferred_element_type=f32)
            logits4 = logits.reshape(hg, gb, n, n) + bias4[i0 // hg][:, None]
            logits = logits4.reshape(hgb, n, n)
            mx = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - mx)
            p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
            pc = p.astype(cdtype)
            if not merged:
                o3 = jax.lax.dot_general(pc, v3, dimension_numbers=dn_av,
                                         preferred_element_type=f32)
                dp = jax.lax.dot_general(do3, v3, dimension_numbers=dn_qk,
                                         preferred_element_type=f32)
                dv3 = jax.lax.dot_general(pc, do3, dimension_numbers=dn_t,
                                          preferred_element_type=f32)
            if dsoftmax:
                dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            else:  # skip the softmax-bwd VPU pass (wrong values)
                dlogits = dp * (1.0 / n)
            dbias_new.extend(dlogits.reshape(hg, gb, n, n).sum(axis=1))
            dlc = dlogits.astype(cdtype)
            if merged:
                pdl = jnp.concatenate([pc, dlc], axis=0)
                m2 = jax.lax.dot_general(
                    pdl, jnp.concatenate([v3, k3], axis=0),
                    dimension_numbers=dn_av, preferred_element_type=f32)
                m2v = m2.reshape(2, hgb, n, dh)
                o3, dq3 = m2v[0], m2v[1]
                m3 = jax.lax.dot_general(
                    pdl, jnp.concatenate([do3, q3], axis=0),
                    dimension_numbers=dn_t, preferred_element_type=f32)
                m3v = m3.reshape(2, hgb, n, dh)
                dv3, dk3 = m3v[0], m3v[1]
            else:
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
        dq2 = ((dq_heads[0] if h == 1
                else jnp.concatenate(dq_heads, axis=-1)) * scale)
        dkv2 = jnp.concatenate(
            [dk_heads[0] if h == 1 else jnp.concatenate(dk_heads, axis=-1),
             dv_heads[0] if h == 1 else jnp.concatenate(dv_heads, axis=-1)],
            axis=-1)
        dbias_list = dbias_new
    else:  # skip the whole per-head stage (wrong values)
        o2 = do2.astype(cdtype)
        dq2 = do2
        dkv2 = jnp.concatenate([do2, do2], axis=-1)
        dbias_list = None

    dq2c = dq2.astype(cdtype)
    dkv2c = dkv2.astype(cdtype)
    if dxchain:
        dy2 = (jnp.dot(dq2c, wq.T, preferred_element_type=f32)
               + jnp.dot(dkv2c, wkv.T, preferred_element_type=f32))
        dy = dy2.reshape(gb, n, c)
        dxh = dy * lns
        m1 = jnp.mean(dxh, axis=-1, keepdims=True)
        m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
        dx = inv * (dxh - m1 - xhat * m2)
        dx_ref[...] = dx.astype(dx_ref.dtype)
    else:
        dy = xf
        dx_ref[...] = x_ref[...]

    @pl.when(i == 0)
    def _init():
        for r in (dlns_ref, dlnb_ref, dwq_ref, dbq_ref, dwkv_ref, dbkv_ref,
                  dwproj_ref, dbproj_ref, dbias_ref):
            r[...] = jnp.zeros_like(r)

    if wgrads:
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
        if dbias_list is not None:
            for hi in range(h):
                dbias_ref[hi] += dbias_list[hi]


def abl_backward(c: int, res: int, heads: int, *, recompute=True,
                 dsoftmax=True, wgrads=True, dxchain=True, core=True,
                 merged=False, vmem_budget: int = 2 * 2**20,
                 hg_cap: int = 32):
    """pallas_call wrapper: [G,N,C] windows in, production block picker
    (parametrized budget)."""
    nw = (res // WS) ** 2
    gsz = B * nw
    gb = pick_block_windows(gsz, N, c, vmem_budget=vmem_budget)
    h = heads
    kernel = functools.partial(
        _abl_bwd_kernel, heads=h, n=N, c=c, gb=gb, hg_cap=hg_cap,
        recompute=recompute, dsoftmax=dsoftmax, wgrads=wgrads,
        dxchain=dxchain, core=core, merged=merged)
    full2 = lambda *_: (0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((gb, N, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, N, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 2 * c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, N, N), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = (
        jax.ShapeDtypeStruct((gsz, N, c), CDTYPE),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((c, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((c, 2 * c), jnp.float32),
        jax.ShapeDtypeStruct((1, 2 * c), jnp.float32),
        jax.ShapeDtypeStruct((c, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((h, N, N), jnp.float32),
    )
    acc = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out_specs = (
        pl.BlockSpec((gb, N, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        acc((1, c)), acc((1, c)), acc((c, c)), acc((1, c)),
        acc((c, 2 * c)), acc((1, 2 * c)), acc((c, c)), acc((1, c)),
        acc((h, N, N)),
    )

    def call(x, g, lns, lnb, wq, bq, wkv, bkv, wproj, bias):
        outs = pl.pallas_call(
            kernel, grid=(gsz // gb,), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
            interpret=jax.default_backend() != "tpu",
        )(x, g, lns.reshape(1, c), lnb.reshape(1, c), wq, bq.reshape(1, c),
          wkv, bkv.reshape(1, 2 * c), wproj, bias.astype(jnp.float32))
        return outs

    return call, gb


def _win_args(c: int, res: int, heads: int, key=0):
    rng = np.random.default_rng(key)
    u = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    nw = (res // WS) ** 2
    x = u(B * nw, N, c).astype(CDTYPE)
    g = u(B * nw, N, c).astype(CDTYPE)
    return (x, g, u(c), u(c), u(c, c), u(c), u(c, 2 * c), u(2 * c),
            u(c, c), u(heads, N, N))


def run_check() -> None:
    """Pin the unablated copy against the PRODUCTION backward kernel on a
    small shape (CPU interpret) — the ablation deltas only mean something if
    the full copy computes the same thing the production kernel does."""
    from fbanet_tpu.ops.attention_pallas import _AttnStatic, _pallas_backward

    c, res, heads = 64, 16, 2
    x, g, lns, lnb, wq, bq, wkv, bkv, wproj, bias = _win_args(c, res, heads)
    bproj = jnp.zeros((c,), jnp.float32)

    fn, gb = abl_backward(c, res, heads)
    mine = fn(x, g, lns, lnb, wq, bq, wkv, bkv, wproj, bias)

    cfg = _AttnStatic(heads=heads, windows_per_image=(res // WS) ** 2,
                      compute_dtype="bfloat16", block_windows=gb,
                      interpret=jax.default_backend() != "tpu")
    prod = _pallas_backward(cfg, x, g, lns, lnb, wq, bq, wkv, bkv, wproj,
                            bias, None)
    names = ["dx", "dlns", "dlnb", "dwq", "dbq", "dwkv", "dbkv", "dwproj",
             "dbproj", "dbias"]
    mine_flat = [mine[0], mine[1].reshape(-1), mine[2].reshape(-1), mine[3],
                 mine[4].reshape(-1), mine[5], mine[6].reshape(-1), mine[7],
                 mine[8].reshape(-1), mine[9]]
    ok = True
    for nm, a, b in zip(names, mine_flat, prod):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1e-6, float(np.abs(b).max()))
        err = float(np.abs(a - b).max()) / scale
        status = "OK" if err < 1e-5 else "FAIL"
        ok &= err < 1e-5
        print(f"check {nm:8s} vs production rel-err {err:.2e}  {status}",
              flush=True)
    assert ok, "ablation copy diverges from the production backward"


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    what = [a for a in argv if not a.startswith("--")] or ["groups"]
    global GROUPS
    for a in argv:  # --only=dec0,dec1 restricts the group sweep
        if a.startswith("--only="):
            names = a.split("=", 1)[1].split(",")
            GROUPS = [g for g in GROUPS if g[0] in names]
    print(f"backend={jax.default_backend()} B={B} dtype=bfloat16", flush=True)

    if "check" in what:
        run_check()

    if "groups" in what:
        from fbanet_tpu.ops.attention_pallas import fused_window_attention_2d
        from fbanet_tpu.ops.leff_pallas import fused_leff

        print("\n== per-kernel fwd vs fwd+bwd (grad w.r.t. x + all params)",
              flush=True)
        rows = []
        for name, c, res, heads in GROUPS:
            args = _attn_args(c, res, heads)
            fwd = functools.partial(
                fused_window_attention_2d, mask=None, heads=heads,
                window_size=WS, compute_dtype=CDTYPE)
            try:
                ms_f = time_fn(f"attn/{name} fwd", fwd, args,
                               attn_fwd_gflops(c, res))
                fb = grad_wrapper(fwd, 10)
                ms_fb = time_fn(
                    f"attn/{name} fwd+bwd", fb, args,
                    attn_fwd_gflops(c, res) + attn_bwd_gflops(c, res))
            except Exception as e:
                print(f"attn/{name}: FAILED {e!r}"[:200], flush=True)
                continue
            rows.append(("attn", name, c, res, ms_f, ms_fb,
                         attn_bwd_gflops(c, res)))
        for name, c, res, heads in GROUPS:
            args = _leff_args(c, res)
            fwd = functools.partial(fused_leff, compute_dtype=CDTYPE)
            try:
                ms_f = time_fn(f"leff/{name} fwd", fwd, args,
                               leff_fwd_gflops(c, res))
                fb = grad_wrapper(fwd, 9)
                ms_fb = time_fn(
                    f"leff/{name} fwd+bwd", fb, args,
                    leff_fwd_gflops(c, res) + leff_bwd_gflops(c, res))
            except Exception as e:
                print(f"leff/{name}: FAILED {e!r}"[:200], flush=True)
                continue
            rows.append(("leff", name, c, res, ms_f, ms_fb,
                         leff_bwd_gflops(c, res)))
        print("\n| kernel | group | fwd ms | f+b ms | bwd ms | bwd GF | "
              "bwd TF/s | bwd ms @59 |", flush=True)
        print("|---|---|---|---|---|---|---|---|", flush=True)
        for kind, name, c, res, ms_f, ms_fb, gf_b in rows:
            bwd = ms_fb - ms_f
            tf = gf_b / bwd if bwd > 0 else float("nan")
            at59 = gf_b / CONV_CEILING_TFS
            print(f"| {kind} | {name} c{c}@{res} | {ms_f:.3f} | {ms_fb:.3f} "
                  f"| {bwd:.3f} | {gf_b:.1f} | {tf:.1f} | {at59:.2f} |",
                  flush=True)

    if "xlaref" in what:
        print("\n== XLA window_attention_reference fwd / fwd+bwd (windows in)",
              flush=True)
        for name, c, res, heads in GROUPS:
            a = _win_args(c, res, heads)
            # (x, lns, lnb, wq, bq, wkv, bkv, wproj, bias) + bproj, no mask
            x, _g, lns, lnb, wq, bq, wkv, bkv, wproj, bias = a
            bproj = jnp.zeros((c,), jnp.float32)
            args = (x, lns, lnb, wq, bq, wkv, bkv, wproj, bproj, bias)
            fn = functools.partial(
                lambda *aa: window_attention_reference(
                    *aa, None, heads=heads, compute_dtype=CDTYPE))
            try:
                time_fn(f"xlaref/{name} fwd", fn, args,
                        attn_fwd_gflops(c, res))
                fb = grad_wrapper(fn, 10)
                time_fn(f"xlaref/{name} fwd+bwd", fb, args,
                        attn_fwd_gflops(c, res) + attn_bwd_gflops(c, res))
            except Exception as e:
                print(f"xlaref/{name}: FAILED {e!r}"[:200], flush=True)

    if "leffabl" in what:
        print("\n== saved-residual LeFF XLA backward, stages removed "
              "(wrong math; deltas bound the cost)", flush=True)
        def make_bwd(c, res, *, conv=True, gelu=True, wg=True, dxc=True):
            import jax.numpy as jnp
            from jax import lax as jlax

            def bwd(x, g, lns, lnb, w1, wdw, w2, z1, z2):
                cdtype = CDTYPE
                f32 = jnp.float32
                b, hh, ww, cc = x.shape
                ch = z1.shape[-1]
                xf = x.astype(f32)
                mu = jnp.mean(xf, axis=-1, keepdims=True)
                var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1,
                                                keepdims=True) - mu * mu)
                inv = jlax.rsqrt(var + 1e-5)
                xhat = (xf - mu) * inv
                lnsf = lns.astype(f32)
                y2 = ((xhat * lnsf + lnb.astype(f32)).astype(cdtype)
                      ).reshape(-1, cc)
                h1 = jax.nn.gelu(z1)
                h2 = jax.nn.gelu(z2)
                g2 = g.astype(cdtype).reshape(-1, cc)
                dh2 = jnp.dot(g2, w2.astype(cdtype).T,
                              preferred_element_type=f32).reshape(z2.shape)
                if gelu:
                    _, v2 = jax.vjp(jax.nn.gelu, z2)
                    dz2 = v2(dh2.astype(z2.dtype))[0]
                else:
                    dz2 = dh2.astype(z2.dtype) * 0.7
                if conv:
                    def dwpart(h1_, wdw_):
                        dn = jlax.conv_dimension_numbers(
                            h1_.shape, wdw_.shape, ("NHWC", "HWIO", "NHWC"))
                        return jlax.conv_general_dilated(
                            h1_, wdw_.astype(cdtype), (1, 1),
                            [(1, 1), (1, 1)], dimension_numbers=dn,
                            feature_group_count=ch)
                    _, cv = jax.vjp(dwpart, h1, wdw)
                    dh1, dwdw = cv(dz2)
                else:
                    dh1, dwdw = dz2, jnp.zeros_like(wdw)
                if gelu:
                    _, v1 = jax.vjp(jax.nn.gelu, z1)
                    dz1 = v1(dh1.astype(z1.dtype))[0].reshape(-1, ch)
                else:
                    dz1 = (dh1.astype(z1.dtype) * 0.7).reshape(-1, ch)
                if wg:
                    dw1 = jnp.dot(y2.T, dz1.astype(cdtype),
                                  preferred_element_type=f32)
                    dw2 = jnp.dot(h2.reshape(-1, ch).T, g2,
                                  preferred_element_type=f32)
                else:
                    dw1 = jnp.zeros_like(w1)
                    dw2 = jnp.zeros_like(w2)
                if dxc:
                    dy = jnp.dot(dz1.astype(cdtype),
                                 w1.astype(cdtype).T,
                                 preferred_element_type=f32
                                 ).reshape(b, hh, ww, cc)
                    dxh = dy * lnsf
                    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
                    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
                    dx = (inv * (dxh - m1 - xhat * m2)).astype(x.dtype)
                else:
                    dx = x
                return (jnp.sum(jnp.square(dx.astype(f32)))
                        + jnp.sum(jnp.square(dwdw))
                        + jnp.sum(jnp.square(dw1)) + jnp.sum(jnp.square(dw2))
                        ).reshape(1)
            return bwd

        for name, c, res, heads in GROUPS:
            if name not in ("dec0", "dec1"):
                continue
            ch = 4 * c
            rng2 = np.random.default_rng(3)
            u = lambda *s: jnp.asarray(
                rng2.standard_normal(s).astype(np.float32) * 0.1)
            x = u(B, res, res, c).astype(CDTYPE)
            g = u(B, res, res, c).astype(CDTYPE)
            z1 = u(B, res, res, ch).astype(CDTYPE)
            z2 = u(B, res, res, ch).astype(CDTYPE)
            args = (x, g, u(c), u(c), u(c, ch), u(3, 3, 1, ch), u(ch, c),
                    z1, z2)
            gf = leff_bwd_gflops(c, res)
            for vname, kw in [("full", {}), ("noconv", {"conv": False}),
                              ("nogelu", {"gelu": False}),
                              ("nowgrads", {"wg": False}),
                              ("nodx", {"dxc": False})]:
                try:
                    time_fn(f"leffabl/{name} {vname}",
                            make_bwd(c, res, **kw), args, gf)
                except Exception as e:
                    print(f"leffabl/{name} {vname}: FAILED {e!r}"[:200],
                          flush=True)

    if "merged" in what:
        print("\n== merged-dot bwd core (3 double-batch dots vs 6): exact "
              "math, production budgets", flush=True)
        for name, c, res, heads in GROUPS:
            budget, cap = ((2 * 2**20, 16) if c >= 256 else
                           (4 * 2**20, 32) if c >= 128 else (6 * 2**20, 32))
            args = _win_args(c, res, heads)
            gf = attn_bwd_gflops(c, res)
            full_fn, gb = abl_backward(c, res, heads, vmem_budget=budget,
                                       hg_cap=cap)
            mrg_fn, _ = abl_backward(c, res, heads, merged=True,
                                     vmem_budget=budget, hg_cap=cap)
            try:
                o1 = full_fn(*args)
                o2 = mrg_fn(*args)
                errs = []
                for a, b in zip(o1, o2):
                    a = np.asarray(a, np.float32)
                    b = np.asarray(b, np.float32)
                    errs.append(float(np.abs(a - b).max())
                                / max(1e-6, float(np.abs(a).max())))
                print(f"mrgbwd/{name} parity max-rel {max(errs):.2e}",
                      flush=True)
                time_fn(f"mrgbwd/{name} full gb{gb}",
                        lambda *a, _f=full_fn: _f(*a)[0], args, gf)
                time_fn(f"mrgbwd/{name} merged gb{gb}",
                        lambda *a, _f=mrg_fn: _f(*a)[0], args, gf)
            except Exception as e:
                print(f"mrgbwd/{name}: FAILED {e!r}"[:200], flush=True)

    if "ablate" in what:
        print("\n== attention bwd-kernel ablations (wrong math; deltas only)",
              flush=True)
        for name, c, res, heads in GROUPS:
            args = _win_args(c, res, heads)
            gf = attn_bwd_gflops(c, res)
            variants = [
                ("full", {}),
                ("norecompute", {"recompute": False}),
                ("nodsoftmax", {"dsoftmax": False}),
                ("nowgrads", {"wgrads": False}),
                ("nodx", {"dxchain": False}),
                ("nocore", {"core": False}),
            ]
            for vname, kw in variants:
                fn, gb = abl_backward(c, res, heads, **kw)
                try:
                    time_fn(f"ablbwd/{name} {vname} gb{gb}",
                            lambda *a, _f=fn: _f(*a)[0], args, gf)
                except Exception as e:
                    print(f"ablbwd/{name} {vname}: FAILED {e!r}"[:200],
                          flush=True)

    if "blocks" in what:
        print("\n== production bwd at varied VMEM budgets / head-chunk caps",
              flush=True)
        for name, c, res, heads in GROUPS:
            args = _win_args(c, res, heads)
            gf = attn_bwd_gflops(c, res)
            for budget_mb, cap in [(2, 32), (4, 32), (6, 32), (4, 64),
                                   (2, 16)]:
                fn, gb = abl_backward(c, res, heads,
                                      vmem_budget=budget_mb * 2**20,
                                      hg_cap=cap)
                try:
                    time_fn(
                        f"blkbwd/{name} vmem{budget_mb}MB cap{cap} gb{gb}",
                        lambda *a, _f=fn: _f(*a)[0], args, gf)
                except Exception as e:
                    print(f"blkbwd/{name} vmem{budget_mb}MB cap{cap}: "
                          f"FAILED {e!r}"[:200], flush=True)


if __name__ == "__main__":
    main()
