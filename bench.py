"""Headline benchmark: end-to-end burst SR throughput (align + SR) per chip.

Pipeline measured per iteration, matching BASELINE.md's north-star:
  [B, 14, 160, 160, 3] unaligned burst
    -> on-device ECC alignment (translation, 3-level pyramid — the reference's
       batch motion model, fba_net/homography_alignment.py:97-118)
    -> batched warp
    -> FBANet forward (embed_dim 64, the published configuration)
    -> [B, 640, 640, 3]
All fused into one jitted program, bf16 compute / f32 params.

Baseline for `vs_baseline`: the reference publishes no throughput numbers
(SURVEY.md §6). We estimate the 2xV100 reference at ~1.0 bursts/sec/GPU
end-to-end (torch FBANet forward at batch 1 plus its share of the
multiprocessing OpenCV ECC alignment, which processed 13 frames x 100
iterations per burst on CPU). vs_baseline = bursts_per_sec_per_chip / 1.0;
the driver target is >= 10.

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_pipeline(frames: int, size: int, embed_dim: int):
    from fbanet_tpu.config import ModelConfig
    from fbanet_tpu.models import init_model
    from fbanet_tpu.ops.registration import align_burst

    cfg = ModelConfig(num_frames=frames, img_size=size, embed_dim=embed_dim,
                      window_size=8, dtype="bfloat16")
    model, params = init_model(cfg, jax.random.key(0))

    def pipeline_one(params, bursts):
        aligned, _mats, _rhos = align_burst(
            bursts, motion="translation", levels=3, iters_per_level=10)
        out = model.apply(params, aligned, deterministic=True)
        return jnp.clip(out, 0.0, 1.0)

    return pipeline_one, params


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    frames = int(os.environ.get("BENCH_FRAMES", "14"))
    size = int(os.environ.get("BENCH_SIZE", "160"))
    embed = int(os.environ.get("BENCH_EMBED", "64"))

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rng = np.random.default_rng(0)
    bursts = jnp.asarray(
        rng.uniform(size=(batch, frames, size, size, 3)).astype(np.float32))

    pipeline_one, params = build_pipeline(frames, size, embed)

    # Timing methodology: iterations are chained *inside one jitted program*
    # (each step's input depends on the previous step's output) and the
    # per-iteration time is the slope between two loop lengths. Reasons:
    # (a) per-dispatch wall clock includes host->device round-trip latency
    # that a production input pipeline overlaps away, and (b) on tunneled
    # TPU backends `block_until_ready` can return before device completion,
    # making unchained measurements meaningless (observed: "0.4 ms" for a
    # 400-GFLOP forward). The slope is the honest steady-state number.
    def timed_loop(n: int) -> float:
        @jax.jit
        def loop(params, bursts):
            def body(_i, acc):
                out = pipeline_one(params, bursts + acc * 1e-20)
                return jnp.mean(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        t0 = time.time()
        v = float(loop(params, bursts))  # includes compile on first call
        compile_and_run = time.time() - t0
        t0 = time.time()
        v = float(loop(params, bursts))
        assert v == v, "NaN through the pipeline"
        return time.time() - t0, compile_and_run

    n_lo, n_hi = 3, 9
    t_lo, c_lo = timed_loop(n_lo)
    t_hi, c_hi = timed_loop(n_hi)
    log(f"compile(+run): lo {c_lo:.1f}s hi {c_hi:.1f}s; "
        f"loop times: {t_lo:.3f}s/{n_lo} it, {t_hi:.3f}s/{n_hi} it")
    per_iter = (t_hi - t_lo) / (n_hi - n_lo)
    bursts_per_sec = batch / per_iter
    log(f"steady-state: {per_iter * 1e3:.1f} ms/iter -> "
        f"{bursts_per_sec:.3f} bursts/s/chip")

    baseline_bursts_per_sec_per_gpu = 1.0  # estimated, see module docstring
    print(json.dumps({
        "metric": "bursts_per_sec_per_chip_e2e_align_sr",
        "value": round(bursts_per_sec, 3),
        "unit": "14-frame 160px bursts/sec/chip (align+SR, x4 to 640px)",
        "vs_baseline": round(bursts_per_sec / baseline_bursts_per_sec_per_gpu, 3),
    }))


if __name__ == "__main__":
    main()
