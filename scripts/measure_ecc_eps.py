"""Measure ECC eps early-termination on the inference hot path.

The align stage is ~14% of the e2e align+SR pipeline (docs/ROUND4.md §3b:
9.5 ms of 70.6 ms at B8). `eps > 0` switches the per-level iteration driver
from a static-trip `fori_loop` to a `lax.while_loop` terminating on the
correlation increment (cv2 TermCriteria semantics, built in r3 for CLI
parity, `ops/registration.py:_run_ecc_iters`) — but it was never timed on
the hot path. Under `vmap` the while_loop runs until EVERY lane (B*F
frames) terminates, so the win is bounded by the slowest frame; this
script measures whether anything is left after that and the per-iteration
cond overhead.

Bursts are realistic (smooth content + known subpixel shifts + sensor
noise — pure uniform noise, as in bench.py, has degenerate ECC convergence
behavior), so each setting also reports recovered-translation accuracy.

Usage: python scripts/measure_ecc_eps.py            (real TPU, ~5 min)
       python scripts/measure_ecc_eps.py --cpu      (methodology check)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

B, F, S = 8, 14, 160


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def smooth_image(h, w, seed):
    rng = np.random.default_rng(seed)
    small = rng.uniform(size=(h // 8, w // 8, 3)).astype(np.float32)
    return np.asarray(jax.image.resize(jnp.asarray(small), (h, w, 3),
                                       method="bicubic"))


def make_bursts():
    """[B, F, S, S, 3] smooth bursts with known shifts + noise.

    Returns (bursts, true_shifts[B, F, 2]) — frame 0 unshifted.
    """
    from fbanet_tpu.ops.warp import warp_burst_homography

    rng = np.random.default_rng(7)
    bursts = np.empty((B, F, S, S, 3), np.float32)
    true = np.zeros((B, F, 2), np.float32)
    for b in range(B):
        base = smooth_image(S, S, seed=100 + b)
        frames = [base]
        for f in range(1, F):
            tx, ty = rng.uniform(-3.0, 3.0, size=2)
            mat = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float32)
            moved = np.asarray(warp_burst_homography(
                jnp.asarray(base)[None], jnp.asarray(mat)[None])[0])
            frames.append(moved)
            true[b, f] = (-tx, -ty)  # aligning translation = inverse
        burst = np.stack(frames)
        burst += rng.normal(scale=0.01, size=burst.shape).astype(np.float32)
        bursts[b] = np.clip(burst, 0.0, 1.0)
    return jnp.asarray(bursts), true


def slope(run, n_lo=3, n_hi=9):
    t0 = time.time()
    run(n_lo)
    log(f"  compile(+run): {time.time() - t0:.1f}s")
    t0 = time.time()
    run(n_lo)
    t_lo = time.time() - t0
    t0 = time.time()
    run(n_hi)
    t_hi = time.time() - t0
    per = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
    log(f"  loop times: {t_lo:.3f}s/{n_lo}, {t_hi:.3f}s/{n_hi} "
        f"-> {per:.2f} ms/iter")
    return per


def main() -> None:
    from fbanet_tpu.ops.registration import align_burst

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    bursts, true = make_bursts()

    settings = [
        ("bench-default  lv3 it10 eps0  ", dict(levels=3, iters_per_level=10,
                                                eps=0.0)),
        ("cli-default    lv3 it25 eps0  ", dict(levels=3, iters_per_level=25,
                                                eps=0.0)),
        ("eps-term       lv3 it25 e1e-5 ", dict(levels=3, iters_per_level=25,
                                                eps=1e-5)),
        ("eps-term-short lv3 it10 e1e-5 ", dict(levels=3, iters_per_level=10,
                                                eps=1e-5)),
    ]

    rows = []
    for name, kw in settings:
        fn = jax.jit(lambda x, kw=kw: align_burst(
            x, motion="translation", **kw))

        # accuracy: recovered translation vs ground truth (px)
        _a, mats, _r = fn(bursts)
        rec = np.asarray(mats)[:, :, :2, 2]  # [B, F, 2]
        err = np.abs(rec - true)[:, 1:]      # frame 0 is identity
        mean_err, max_err = float(err.mean()), float(err.max())

        @jax.jit
        def loop(x, n, kw=kw):
            def body(_i, acc):
                aligned, _m, _r = align_burst(
                    x + acc * 1e-20, motion="translation", **kw)
                return jnp.mean(aligned.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def run(n):
            v = float(loop(bursts, n))
            assert v == v

        log(f"{name}:")
        ms = slope(run)
        rows.append((name, ms, mean_err, max_err))

    print("\n| setting | align ms (B8) | mean err px | max err px |")
    print("|---|---|---|---|")
    for name, ms, me, xe in rows:
        print(f"| {name.strip()} | {ms:.2f} | {me:.4f} | {xe:.4f} |")


if __name__ == "__main__":
    main()
