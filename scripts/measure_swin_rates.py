"""Per-kernel rates for the fused Swin attention / LeFF Pallas kernels.

Round-4 localization tool for the forward-headroom question (docs/ROUND4.md
§6): the per-group profile showed the SwinGroups running at 13-45 TFLOP/s
against the measured ~59 TFLOP/s XLA-conv ceiling, but each group conflates
window attention + LeFF (x depth 2). This script times the two kernels
separately at every group shape of the flagship model (embed 64, 160px,
B=8, bf16 compute), plus in-kernel ablations that carve the time up further:

  attention ablations (same block structure, pieces replaced):
    - nosoftmax: softmax -> multiply by 1/n   (isolates softmax VPU cost)
    - nocore:    skip the whole per-head stage (logits/softmax/AV/concat)
                 (full - nocore = total attention-core cost incl. the
                 dh=16 tiny-matmul MXU underfill and lane slices)
    - notrans:   skip the in-VMEM window split/merge transposes
                 (isolates the [nr*ws,W,C] <-> [GB,N,C] shuffles)
  LeFF ablations:
    - nogelu: gelu -> x * 0.7      (isolates the two hidden-width GELUs)
    - nodw:   skip the 9-tap depthwise loop (isolates VPU conv + pad)

Ablations change the math (outputs are wrong); they exist purely to bound
where the cycles go. The unablated timings use the production kernels from
fbanet_tpu.ops so the numbers transfer to the model.

Methodology: chained fori_loop slope (see bench.py) — the body feeds
`acc * 1e-7` back into the input so XLA cannot hoist the kernel.

Usage:
    python scripts/measure_swin_rates.py [attn leff ablate] [--bwd]
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

B = 8
WS = 8
N = WS * WS
CDTYPE = jnp.bfloat16

# (name, channels, resolution, heads) — the five flagship SwinGroups
GROUPS = [
    ("enc0", 64, 160, 1),
    ("enc1", 128, 80, 2),
    ("bott", 256, 40, 16),
    ("dec0", 256, 80, 16),
    ("dec1", 128, 160, 8),
]


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


def attn_gflops(c: int, res: int) -> float:
    nw = (res // WS) ** 2
    return B * nw * (8 * N * c * c + 4 * N * N * c) / 1e9


def leff_gflops(c: int, res: int) -> float:
    ch = 4 * c
    return B * res * res * (4 * c * ch + 18 * ch) / 1e9


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


def time_fn(name: str, fn, args, gf: float, x_idx: int = 0) -> float:
    """Time fn(*args) with args[x_idx] perturbed per iteration."""
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
    ms = slope(run)
    tf = gf / ms
    print(f"{name:34s} {ms:8.3f} ms  {gf:7.1f} GF  {tf:6.1f} TF/s",
          flush=True)
    return ms


# ---------------------------------------------------------------------------
# Ablation kernel: a self-contained copy of the 2-D attention kernel body
# with switchable pieces. Mirrors ops/attention_pallas._attention2d_kernel.
# ---------------------------------------------------------------------------

def _abl_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
                wproj_ref, bproj_ref, bias_ref, out_ref, *, heads, n, c, ws,
                nwr, nr, softmax, perhead, trans):
    cdtype = CDTYPE
    h, dh = heads, c // heads
    scale = dh ** -0.5
    gb = nr * nwr
    x4 = x_ref[0]  # [nr*ws, W, C]
    if trans:
        xw = x4.reshape(nr, ws, nwr, ws, c).transpose(0, 2, 1, 3, 4)
        xw = xw.reshape(gb, n, c)
    else:
        xw = x4.reshape(gb, n, c)  # wrong windows, same shapes/layout work

    xf = xw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + 1e-5) * lns_ref[...].astype(jnp.float32)
    y = ((xf - mu) * mul + lnb_ref[...].astype(jnp.float32)).astype(cdtype)

    y2 = y.reshape(gb * n, c)
    q2 = (jnp.dot(y2, wq_ref[...].astype(cdtype),
                  preferred_element_type=jnp.float32)
          + bq_ref[...].astype(jnp.float32)) * scale
    kv2 = (jnp.dot(y2, wkv_ref[...].astype(cdtype),
                   preferred_element_type=jnp.float32)
           + bkv_ref[...].astype(jnp.float32))
    q2 = q2.astype(cdtype)
    kv2 = kv2.astype(cdtype)

    if perhead:
        dn = (((2,), (2,)), ((0,), (0,)))
        dn_av = (((2,), (1,)), ((0,), (0,)))
        outs = []
        for i in range(h):
            qh = q2[:, i * dh:(i + 1) * dh].reshape(gb, n, dh)
            kh = kv2[:, i * dh:(i + 1) * dh].reshape(gb, n, dh)
            vh = kv2[:, c + i * dh:c + (i + 1) * dh].reshape(gb, n, dh)
            attn = jax.lax.dot_general(qh, kh, dimension_numbers=dn,
                                       preferred_element_type=jnp.float32)
            attn = attn + bias_ref[i][None]
            if softmax:
                attn = jax.nn.softmax(attn, axis=-1).astype(cdtype)
            else:
                attn = (attn * (1.0 / n)).astype(cdtype)
            oh = jax.lax.dot_general(attn, vh, dimension_numbers=dn_av,
                                     preferred_element_type=jnp.float32)
            outs.append(oh.astype(cdtype).reshape(gb * n, dh))
        o2 = outs[0] if h == 1 else jnp.concatenate(outs, axis=-1)
    else:
        # "nocore": skip the whole per-head stage (logits/softmax/AV/concat)
        # — the full-vs-nocore delta is the attention core's total cost
        o2 = (q2 + kv2[:, :c] + kv2[:, c:]).reshape(gb * n, c)

    out = (jnp.dot(o2, wproj_ref[...].astype(cdtype),
                   preferred_element_type=jnp.float32)
           + bproj_ref[...].astype(jnp.float32))
    out = out.reshape(gb, n, c)
    if trans:
        out4 = out.reshape(nr, nwr, ws, ws, c).transpose(0, 2, 1, 3, 4)
        out4 = out4.reshape(nr * ws, nwr * ws, c)
    else:
        out4 = out.reshape(nr * ws, nwr * ws, c)
    out_ref[0] = out4.astype(out_ref.dtype)


def abl_attention(c, res, heads, *, softmax=True, perhead=True, trans=True):
    """pallas_call wrapper around the ablation kernel (mask-free path)."""
    nwr = nh = res // WS
    # replicate the production nr picker
    nr = 1
    for cand in range(nh, 0, -1):
        if nh % cand:
            continue
        vmem = (cand * WS * res * c * 4 * 7 + cand * nwr * N * N * 4 * 3)
        if cand * nwr <= 64 and vmem <= 6 * 2**20:
            nr = cand
            break

    kernel = functools.partial(_abl_kernel, heads=heads, n=N, c=c, ws=WS,
                               nwr=nwr, nr=nr, softmax=softmax,
                               perhead=perhead, trans=trans)
    full2 = lambda *_: (0, 0)  # noqa: E731

    def call(x4, lns, lnb, wq, bq, wkv, bkv, wproj, bproj, bias):
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
            pl.BlockSpec((heads, N, N), lambda bi, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kernel,
            grid=(B, nh // nr),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, nr * WS, res, c),
                                   lambda bi, ii: (bi, ii, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, res, res, c), x4.dtype),
            interpret=jax.default_backend() != "tpu",
        )(x4, lns.reshape(1, c), lnb.reshape(1, c), wq, bq.reshape(1, c),
          wkv, bkv.reshape(1, 2 * c), wproj, bproj.reshape(1, c),
          bias.astype(jnp.float32))

    return call


# LeFF ablation: copy of _leff_kernel with switches ------------------------

def _leff_abl_kernel(xp_ref, xc_ref, xn_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                     wdw_ref, bdw_ref, w2_ref, b2_ref, out_ref, *, rows, w, c,
                     ch, gelu, dw):
    cdtype = CDTYPE
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    act = jax.nn.gelu if gelu else (lambda v: v * 0.7)

    x = jnp.concatenate([xp_ref[0, rows - 1:rows], xc_ref[0],
                         xn_ref[0, 0:1]], axis=0)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + 1e-5) * lns_ref[...].astype(jnp.float32)
    y = ((xf - mu) * mul + lnb_ref[...].astype(jnp.float32)).astype(cdtype)

    y2 = y.reshape((rows + 2) * w, c)
    h1 = act(jnp.dot(y2, w1_ref[...].astype(cdtype),
                     preferred_element_type=jnp.float32)
             + b1_ref[...].astype(jnp.float32)).astype(cdtype)
    h1 = h1.reshape(rows + 2, w, ch)

    if dw:
        r = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
        valid = ((r > 0) | (i > 0)) & ((r < rows + 1) | (i < ni - 1))
        h1 = jnp.where(valid, h1, jnp.zeros((), cdtype))
        h1p = jnp.pad(h1, ((0, 0), (1, 1), (0, 0)))
        acc = jnp.broadcast_to(bdw_ref[...].astype(jnp.float32),
                               (rows, w, ch))
        for ky in range(3):
            for kx in range(3):
                tap = wdw_ref[ky, kx].astype(jnp.float32)
                acc = acc + h1p[ky:ky + rows, kx:kx + w] * tap
        h2 = act(acc).astype(cdtype)
    else:
        h2 = act(h1[1:rows + 1].astype(jnp.float32)).astype(cdtype)

    out = (jnp.dot(h2.reshape(rows * w, ch), w2_ref[...].astype(cdtype),
                   preferred_element_type=jnp.float32)
           + b2_ref[...].astype(jnp.float32)).reshape(rows, w, c)
    out_ref[0] = out.astype(out_ref.dtype)


def abl_leff(c, res, *, gelu=True, dw=True, rows=None):
    from fbanet_tpu.ops.leff_pallas import _pick_fwd_rows
    ch = 4 * c
    if rows is None:
        rows = _pick_fwd_rows(res, res, c, ch, hbytes=2)
    assert rows is not None and res % rows == 0
    ni = res // rows
    kernel = functools.partial(_leff_abl_kernel, rows=rows, w=res, c=c, ch=ch,
                               gelu=gelu, dw=dw)
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
            grid=(B, ni),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, rows, res, c),
                                   lambda bi, ii: (bi, ii, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, res, res, c), x.dtype),
            interpret=jax.default_backend() != "tpu",
        )(x, x, x, lns.reshape(1, c), lnb.reshape(1, c), w1,
          b1.reshape(1, ch), wdw, bdw.reshape(1, ch), w2, b2.reshape(1, c))

    return call


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    what = [a for a in argv if not a.startswith("--")] or ["attn", "leff"]
    from fbanet_tpu.ops.attention_pallas import fused_window_attention_2d
    from fbanet_tpu.ops.leff_pallas import fused_leff

    print(f"backend={jax.default_backend()} B={B} dtype=bfloat16",
          flush=True)

    if "attn" in what:
        for name, c, res, heads in GROUPS:
            args = _attn_args(c, res, heads)
            fn = functools.partial(
                fused_window_attention_2d, mask=None, heads=heads,
                window_size=WS, compute_dtype=CDTYPE)
            time_fn(f"attn/{name}_c{c}@{res}h{heads}", fn, args,
                    attn_gflops(c, res))

    if "leff" in what:
        for name, c, res, _heads in GROUPS:
            args = _leff_args(c, res)
            fn = functools.partial(fused_leff, compute_dtype=CDTYPE)
            time_fn(f"leff/{name}_c{c}@{res}", fn, args,
                    leff_gflops(c, res))

    if "ablate" in what:
        for name, c, res, heads in GROUPS:
            args = _attn_args(c, res, heads)
            gf = attn_gflops(c, res)
            time_fn(f"abl-attn/{name} full", abl_attention(c, res, heads),
                    args, gf)
            time_fn(f"abl-attn/{name} nosoftmax",
                    abl_attention(c, res, heads, softmax=False), args, gf)
            time_fn(f"abl-attn/{name} nocore",
                    abl_attention(c, res, heads, perhead=False), args, gf)
            time_fn(f"abl-attn/{name} notrans",
                    abl_attention(c, res, heads, trans=False), args, gf)
        for name, c, res, _heads in GROUPS:
            args = _leff_args(c, res)
            gf = leff_gflops(c, res)
            time_fn(f"abl-leff/{name} full", abl_leff(c, res), args, gf)
            time_fn(f"abl-leff/{name} nogelu", abl_leff(c, res, gelu=False),
                    args, gf)
            time_fn(f"abl-leff/{name} nodw", abl_leff(c, res, dw=False),
                    args, gf)


if __name__ == "__main__":
    main()
