"""TPU measurements for VERDICT r3 item 4.

(a) Downsample A/B: the 4x4/s2 strided nn.Conv form vs the new pad +
    space-to-depth + matmul-taps form (models/layers.py:Downsample) at the
    two shapes the flagship U-Net runs it (B8 160^2 C64->128, 80^2
    C128->256), fwd-only and fwd+bwd.
(b) B16 root cause: the r3 bench measured per-burst inference THROUGHPUT
    DROPPING from B8 (115.4/s) to B16 (103.6/s). Decompose: time the model
    forward and the ECC align separately at B4/B8/B16 to find which stage
    loses occupancy.
(c) "ab": model-level Downsample A/B — full forward at B8 with the s2d+mm
    form vs the strided-conv form (monkeypatched; identical param tree), the
    decisive comparison after (a)'s micro numbers drowned in tunnel noise
    (sub-ms op, +-0.5 ms run-to-run).
(d) "prof": per-component FORWARD-ONLY times at B8 vs B16 (heads, FAF, the
    five SwinGroup shapes, tail) to locate the B16 occupancy loss.

Methodology: chained fori_loop slope (see bench.py); micro shapes use long
loops (25/100) so the slope rises above tunnel noise.
Usage: python scripts/measure_downsample_b16.py [down fwd align pipe ab prof]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def slope(loop_fn, n_lo: int = 3, n_hi: int = 9) -> float:
    t0 = time.time()
    loop_fn(n_lo)
    log(f"  compile: {time.time() - t0:.1f}s")
    t0 = time.time()
    loop_fn(n_lo)
    t_lo = time.time() - t0
    t0 = time.time()
    loop_fn(n_hi)
    t_hi = time.time() - t0
    per = (t_hi - t_lo) / (n_hi - n_lo)
    log(f"  -> {per * 1e3:.3f} ms/iter")
    return per * 1e3


def time_fwd_module(name, module, x_shape, n_lo=3, n_hi=9):
    """Forward-only ms/iter of module.apply on random input."""
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(size=x_shape).astype(np.float32))
    params = jax.jit(lambda k: module.init(k, x0))(jax.random.key(0))

    @jax.jit
    def loop(p, v, n):
        def body(_i, acc):
            return jnp.mean(module.apply(p, v + acc * 1e-7).astype(
                jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def run(n):
        v = float(loop(params, x0, n))
        assert v == v

    log(f"{name}:")
    return slope(run, n_lo, n_hi)


class DownConv(nn.Module):
    """The strided-conv form (what models/layers.py ships, by this
    measurement)."""
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (4, 4), strides=2, padding=1,
                       dtype=jnp.bfloat16)(x)


class DownS2D(nn.Module):
    """The measured-and-rejected pad + space-to-depth + matmul-taps form:
    P2[y, x, (d,e,i)] = pad(x,1)[2y+d, 2x+e, i]; out[y', x'] =
    sum_{a,b} P2[y'+a, x'+b] @ K[2a+d, 2b+e, i, o]. Exact same math and
    param tree as the strided conv (was pinned by a since-removed
    equivalence test while it shipped)."""

    features: int
    dtype: object = jnp.bfloat16
    param_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        from fbanet_tpu.models.layers import _ConvParams

        b, h, w, c = x.shape
        kernel, bias = _ConvParams((4, 4), c, self.features,
                                   param_dtype=self.param_dtype,
                                   name="Conv_0")()
        kd = kernel.reshape(2, 2, 2, 2, c, self.features).astype(self.dtype)
        h2, w2 = h // 2, w // 2
        p = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        p2 = p.reshape(b, h2 + 1, 2, w2 + 1, 2, c).transpose(0, 1, 3, 2, 4, 5)
        p2 = p2.reshape(b, h2 + 1, w2 + 1, 4 * c)
        out = bias.astype(self.dtype)
        for a in range(2):
            for bb in range(2):
                k_ab = kd[a, :, bb].reshape(4 * c, self.features)
                out = out + jnp.einsum("bhwk,ko->bhwo",
                                       p2[:, a:a + h2, bb:bb + w2], k_ab)
        return out


def time_mod(name, module, x_shape, fwd_only, n_lo=25, n_hi=100):
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(size=x_shape).astype(np.float32))
    params = jax.jit(lambda k: module.init(k, x0))(jax.random.key(0))

    def f(p, v):
        return jnp.mean(module.apply(p, v).astype(jnp.float32))

    @jax.jit
    def loop(p, v, n):
        def body(_i, acc):
            if fwd_only:
                return f(p, v + acc * 1e-7)
            val, (gp, gv) = jax.value_and_grad(f, argnums=(0, 1))(
                p, v + acc * 1e-7)
            leaves = [jnp.mean(t.astype(jnp.float32))
                      for t in jax.tree.leaves(gp)] + [jnp.mean(gv), val]
            return sum(leaves)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def run(n):
        v = float(loop(params, x0, n))
        assert v == v

    log(f"{name}:")
    return slope(run, n_lo, n_hi)


def main() -> None:
    which = set(sys.argv[1:]) or {"down", "fwd", "align", "pipe"}
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    bf16 = jnp.bfloat16

    if "down" in which:
        print("| shape | form | fwd ms | fwd+bwd ms |")
        print("|---|---|---|---|")
        for (b, s, c, f) in [(8, 160, 64, 128), (8, 80, 128, 256)]:
            for tag, mod in [("conv", DownConv(f)),
                             ("s2d+mm", DownS2D(f, dtype=bf16))]:
                fw = time_mod(f"down {tag} B{b} {s}^2 C{c}->{f} fwd",
                              mod, (b, s, s, c), True)
                fb = time_mod(f"down {tag} B{b} {s}^2 C{c}->{f} fwd+bwd",
                              mod, (b, s, s, c), False)
                print(f"| B{b} {s}^2 {c}->{f} | {tag} | {fw:.3f} | "
                      f"{fb:.3f} |", flush=True)

    if "ab" in which:
        # Model-level decision: full forward at B8/B4 with each Downsample
        # form. fbanet.py imports Downsample from layers at TRACE time, so
        # swapping the module attribute switches the form; both share the
        # param tree (Conv_0/{kernel [4,4,C,F], bias}).
        import fbanet_tpu.models.layers as L
        from fbanet_tpu.config import ModelConfig
        from fbanet_tpu.models import init_model

        shipped = L.Downsample
        cfg = ModelConfig(num_frames=14, img_size=160, embed_dim=64,
                          window_size=8, dtype="bfloat16")
        try:
            for b in (8, 4):
                rng = np.random.default_rng(1)
                x = jnp.asarray(
                    rng.uniform(size=(b, 14, 160, 160, 3)).astype(np.float32))
                for tag, klass in [("s2d+mm", DownS2D), ("conv", shipped)]:
                    L.Downsample = klass
                    model, params = init_model(cfg, jax.random.key(0))

                    @jax.jit
                    def mloop(p, v, n):
                        def body(_i, acc):
                            return jnp.mean(model.apply(p, v + acc * 1e-7,
                                                        deterministic=True))
                        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

                    def mrun(n):
                        v = float(mloop(params, x, n))
                        assert v == v
                    log(f"model fwd B{b} downsample={tag}:")
                    ms = slope(mrun)
                    print(f"ab fwd B{b} {tag}: {ms:.2f} ms", flush=True)
        finally:
            L.Downsample = shipped

    if "prof" in which:
        from fbanet_tpu.models.blocks import (
            FAFBlock,
            ResBlock,
            SwinGroup,
            _UpsamplerParams,
            fused_tail_x4,
        )
        from fbanet_tpu.models.layers import _ConvParams

        D, S, F = 64, 160, 14

        class Heads(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(D, (3, 3), padding=1, dtype=bf16)(x.astype(bf16))
                x = ResBlock(D, dtype=bf16)(x)
                return ResBlock(D, dtype=bf16)(x)

        class Tail(nn.Module):
            @nn.compact
            def __call__(self, x):
                w0, b0, w1, b1 = _UpsamplerParams(D)()
                wt, bt = _ConvParams(
                    (3, 3), D, 3,
                    kernel_init=nn.initializers.normal(0.02))()
                return fused_tail_x4(x.astype(bf16), w0, b0, w1, b1, wt, bt,
                                     bf16)

        def grp(dim, res, heads):
            return SwinGroup(dim=dim, input_resolution=(res, res), depth=2,
                             heads=heads, window_size=8, token_mlp="leff",
                             attention_impl="auto", remat=False, dtype=bf16)

        comps = [
            ("heads", Heads(), lambda b: (b * F, S, S, 3)),
            ("faf", FAFBlock(num_feats=D, num_frames=F, dtype=bf16),
             lambda b: (b, F, S, S, D)),
            ("enc0_d64@160", grp(D, S, 1), lambda b: (b, S, S, D)),
            ("enc1_d128@80", grp(2 * D, S // 2, 2), lambda b: (b, S // 2,
                                                               S // 2, 2 * D)),
            ("bott_d256@40", grp(4 * D, S // 4, 16), lambda b: (b, S // 4,
                                                                S // 4, 4 * D)),
            ("dec0_d256@80", grp(4 * D, S // 2, 16), lambda b: (b, S // 2,
                                                                S // 2, 4 * D)),
            ("dec1_d128@160", grp(2 * D, S, 8), lambda b: (b, S, S, 2 * D)),
            ("tail", Tail(), lambda b: (b, S, S, D)),
        ]
        print("| component | B8 fwd ms | B16 fwd ms | B16/B8 |")
        print("|---|---|---|---|")
        for name, mod, shp in comps:
            t8 = time_fwd_module(f"{name} B8 fwd", mod, shp(8))
            t16 = time_fwd_module(f"{name} B16 fwd", mod, shp(16))
            print(f"| {name} | {t8:.2f} | {t16:.2f} | {t16 / t8:.2f} |",
                  flush=True)

    frames, size, embed = 14, 160, 64
    if which & {"fwd", "pipe"}:
        from fbanet_tpu.config import ModelConfig
        from fbanet_tpu.models import init_model
        cfg = ModelConfig(num_frames=frames, img_size=size, embed_dim=embed,
                          window_size=8, dtype="bfloat16")
        model, params = init_model(cfg, jax.random.key(0))

    if "fwd" in which:
        for b in (4, 8, 16):
            rng = np.random.default_rng(1)
            x = jnp.asarray(
                rng.uniform(size=(b, frames, size, size, 3)).astype(np.float32))

            @jax.jit
            def mloop(p, v, n):
                def body(_i, acc):
                    return jnp.mean(model.apply(p, v + acc * 1e-7,
                                                deterministic=True))
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            def mrun(n):
                v = float(mloop(params, x, n))
                assert v == v
            log(f"model fwd B{b}:")
            ms = slope(mrun)
            print(f"fwd B{b}: {ms:.2f} ms = {b / ms * 1e3:.1f} bursts/s",
                  flush=True)

    if "align" in which:
        from fbanet_tpu.ops.registration import align_burst
        for b in (8, 16):
            rng = np.random.default_rng(0)
            bursts = jnp.asarray(
                rng.uniform(size=(b, frames, size, size, 3)).astype(np.float32))

            @jax.jit
            def aloop(v, n):
                def body(_i, acc):
                    aligned, _m, _r = align_burst(
                        v + acc * 1e-7, motion="translation", levels=3,
                        iters_per_level=10)
                    return jnp.mean(aligned)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            def arun(n):
                v = float(aloop(bursts, n))
                assert v == v
            log(f"align B{b}:")
            ms = slope(arun)
            print(f"align B{b}: {ms:.2f} ms = {b / ms * 1e3:.1f} bursts/s",
                  flush=True)

    if "pipe" in which:
        from fbanet_tpu.ops.registration import align_burst
        for b in (8, 16):
            rng = np.random.default_rng(0)
            bursts = jnp.asarray(
                rng.uniform(size=(b, frames, size, size, 3)).astype(np.float32))

            @jax.jit
            def ploop(p, v, n):
                def body(_i, acc):
                    aligned, _m, _r = align_burst(
                        v + acc * 1e-20, motion="translation", levels=3,
                        iters_per_level=10)
                    out = model.apply(p, aligned, deterministic=True)
                    return jnp.mean(jnp.clip(out, 0.0, 1.0).astype(jnp.float32))
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            def prun(n):
                v = float(ploop(params, bursts, n))
                assert v == v
            log(f"pipeline B{b}:")
            ms = slope(prun)
            print(f"pipeline B{b}: {ms:.2f} ms = {b / ms * 1e3:.1f} bursts/s",
                  flush=True)


if __name__ == "__main__":
    main()
