"""Per-component timing of the FBANet forward/backward on the current
backend (the tool behind docs/ROUND3.md's train-step deep profile).

Methodology (see bench.py): iterations are chained inside ONE jitted
fori_loop and the per-iteration time is the slope between two loop lengths.
The chain adds `acc * 1e-7` to the input — NOT `1e-20`, which underflows in
f32 (x + 1e-20 == x exactly), letting XLA hoist a fully-elementwise body
out of the loop; the GW-loss measurement then reads ~0 (this bit us in r3).

Usage:
    python scripts/profile_components.py loss heads faf swin tail model train align
Each component compiles separately (1-8 min each over a tunneled TPU).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

B, F, S, D = 8, 14, 160, 64


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
    log(f"  -> {per * 1e3:.2f} ms/iter")
    return per * 1e3


def time_grad(name: str, module, x_shape, fwd_only: bool = False) -> float:
    """fwd(+bwd) ms/iter of mean(module.apply(params, x)) wrt (params, x)."""
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
        assert v == v, "NaN"

    log(f"{name}:")
    return slope(run)


def main(argv=None) -> None:
    from flax import linen as nn

    which = set(argv if argv is not None else sys.argv[1:]) or {
        "loss", "heads", "faf", "swin", "tail", "model", "train"}
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    out: dict[str, float] = {}
    bf16 = jnp.bfloat16

    if "loss" in which:
        from fbanet_tpu.losses import fbanet_training_loss
        rng = np.random.default_rng(0)
        pred = jnp.asarray(
            rng.uniform(size=(B, 4 * S, 4 * S, 3)).astype(np.float32))
        hr = jnp.asarray(
            rng.uniform(size=(B, 4 * S, 4 * S, 3)).astype(np.float32))

        @jax.jit
        def lloop(pred, hr, n):
            def body(_i, acc):
                val, g = jax.value_and_grad(fbanet_training_loss)(
                    pred + acc * 1e-7, hr)
                return val + jnp.mean(g)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def lrun(n):
            v = float(lloop(pred, hr, n))
            assert v == v
        log("loss (charb+GW+TV @640^2) fwd+bwd:")
        out["loss"] = slope(lrun)

    if "heads" in which:
        from fbanet_tpu.models.blocks import ResBlock

        class Heads(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(D, (3, 3), padding=1, dtype=bf16)(x.astype(bf16))
                x = ResBlock(D, dtype=bf16)(x)
                return ResBlock(D, dtype=bf16)(x)

        out["heads"] = time_grad("heads (conv + 2 ResBlocks, B*F frames)",
                                 Heads(), (B * F, S, S, 3))

    if "faf" in which:
        from fbanet_tpu.models.blocks import FAFBlock
        out["faf"] = time_grad(
            "FAF block",
            FAFBlock(num_feats=D, num_frames=F, dtype=bf16),
            (B, F, S, S, D))

    if "swin" in which:
        from fbanet_tpu.models.blocks import SwinGroup

        def grp(dim, res, heads):
            return SwinGroup(dim=dim, input_resolution=(res, res), depth=2,
                             heads=heads, window_size=8, token_mlp="leff",
                             attention_impl="auto", remat=False, dtype=bf16)

        for key, dim, res, heads in [("enc0_d64@160", D, S, 1),
                                     ("enc1_d128@80", 2 * D, S // 2, 2),
                                     ("bott_d256@40", 4 * D, S // 4, 16),
                                     ("dec0_d256@80", 4 * D, S // 2, 16),
                                     ("dec1_d128@160", 2 * D, S, 8)]:
            out[key] = time_grad(f"SwinGroup {key}", grp(dim, res, heads),
                                 (B, res, res, dim))

    if "tail" in which:
        from fbanet_tpu.models.blocks import _UpsamplerParams, fused_tail_x4
        from fbanet_tpu.models.layers import _ConvParams

        class Tail(nn.Module):
            @nn.compact
            def __call__(self, x):
                w0, b0, w1, b1 = _UpsamplerParams(D)()
                wt, bt = _ConvParams(
                    (3, 3), D, 3,
                    kernel_init=nn.initializers.normal(0.02))()
                return fused_tail_x4(x.astype(bf16), w0, b0, w1, b1, wt, bt,
                                     bf16)

        out["tail"] = time_grad("fused tail x4", Tail(), (B, S, S, D))

    if "model" in which or "train" in which:
        from fbanet_tpu.config import ModelConfig
        from fbanet_tpu.models import init_model
        cfg = ModelConfig(num_frames=F, img_size=S, embed_dim=D,
                          window_size=8, dtype="bfloat16")
        model, params = init_model(cfg, jax.random.key(0))
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.uniform(size=(B, F, S, S, 3)).astype(np.float32))

    if "model" in which:
        @jax.jit
        def mloop(p, v, n):
            def body(_i, acc):
                return jnp.mean(model.apply(p, v + acc * 1e-7,
                                            deterministic=True))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def mrun(n):
            v = float(mloop(params, x, n))
            assert v == v
        log("full model forward:")
        out["model_fwd"] = slope(mrun)

    if "train" in which:
        import optax

        from fbanet_tpu.config import TrainConfig
        from fbanet_tpu.losses import fbanet_training_loss
        tcfg = TrainConfig()
        tx = optax.adamw(tcfg.lr_initial, weight_decay=tcfg.weight_decay)
        opt_state = tx.init(params)
        hr = jnp.asarray(
            np.random.default_rng(2)
            .uniform(size=(B, 4 * S, 4 * S, 3)).astype(np.float32))

        def loss_fn(p, v, y):
            return fbanet_training_loss(
                model.apply(p, v, deterministic=True), y)

        @jax.jit
        def tloop(params, opt_state, v, y, n):
            def body(_i, carry):
                p, o, acc = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, v + acc * 1e-7, y)
                updates, o = tx.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o, loss)
            _, _, loss = jax.lax.fori_loop(
                0, n, body, (params, opt_state, jnp.float32(0.0)))
            return loss

        def trun(n):
            v = float(tloop(params, opt_state, x, hr, n))
            assert v == v
        log("full train step (fwd+bwd+adamw):")
        out["train"] = slope(trun)

    if "align" in which:
        from fbanet_tpu.ops.registration import align_burst
        rng = np.random.default_rng(0)
        bursts = jnp.asarray(
            rng.uniform(size=(B, F, S, S, 3)).astype(np.float32))

        @jax.jit
        def aloop(bursts, n):
            def body(_i, acc):
                aligned, _m, _r = align_burst(
                    bursts + acc * 1e-7, motion="translation", levels=3,
                    iters_per_level=10)
                return jnp.mean(aligned)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def arun(n):
            v = float(aloop(bursts, n))
            assert v == v
        log("align_burst (ECC translation, 3 levels, 10 it):")
        out["align"] = slope(arun)

    print({k: round(v, 2) for k, v in out.items()})


if __name__ == "__main__":
    main()
