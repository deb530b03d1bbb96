"""Measure align.py's decode/dispatch/encode overlap on a real burst tree.

VERDICT r3 next #6 asked for a measured overlap speedup on a >=16-burst
tree. Builds a 24-burst synthetic RealBSR tree (14 frames, 160px), then
runs `align_tree` serially (--no_overlap semantics) and pipelined, twice
each (alternating order; first-run decode warms the OS page cache, and jit
caching makes the aligner compile once for all four runs).

The expected win on this host is the per-burst device wait (ECC compute +
the tunneled dispatch/sync round-trip) hidden under the host's PNG
decode/encode — the host work itself is serial on 1 core either way.

Usage: python scripts/measure_align_overlap.py   (TPU, ~5 min)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax

    from fbanet_tpu.align import align_tree
    from fbanet_tpu.data.synthetic import write_synthetic_realbsr

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        tree = root / "in"
        # warp layout = burst dirs directly under the root, LR frames only
        write_synthetic_realbsr(tree, num_bursts=24, num_frames=14,
                                lr_size=160, layout="warp", write_hr=False)

        times = {"serial": [], "pipelined": []}
        for rep in range(2):
            for tag, overlap in (("serial", False), ("pipelined", True)):
                out = root / f"out_{tag}_{rep}"
                t0 = time.time()
                n = align_tree(tree, out, motion="translation", levels=3,
                               iters_per_level=25, report_metrics=False,
                               overlap=overlap)
                dt = time.time() - t0
                assert n == 24, n
                times[tag].append(dt)
                print(f"rep{rep} {tag}: {dt:.2f}s ({n / dt:.2f} bursts/s)",
                      file=sys.stderr)

        s = min(times["serial"])
        p = min(times["pipelined"])
        print(f"| mode | best of 2 (24 bursts) | bursts/s |")
        print(f"|---|---|---|")
        print(f"| serial | {s:.2f} s | {24 / s:.2f} |")
        print(f"| pipelined | {p:.2f} s | {24 / p:.2f} |")
        print(f"overlap speedup: {s / p:.3f}x")


if __name__ == "__main__":
    main()
