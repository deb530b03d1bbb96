"""Registration bake-off harness: compare alignment methods on real frames.

Equivalent of the reference's `sintel_pipeline.py` research harness, which
ran NVIDIA hardware optical flow, OpenCV ECC homography and OpenCV pyramid
registration on MPI-Sintel frame pairs and printed before/after PSNR/SSIM
(reference: fba_net/sintel_pipeline.py:48-78; note its import path was broken
— SURVEY.md §7.11). Here every contender is this framework's own on-device
implementation:

- dense pyramidal LK optical flow + backward warp (ops/flow.py),
- ECC with translation / euclidean / similarity / affine / homography
  motion models
  (ops/registration.py).

Usage:
    python -m fbanet_tpu.bakeoff --frames dir_of_frames [--ref 0]
    python -m fbanet_tpu.bakeoff --synthetic  # no data needed
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fbanet_tpu.metrics import psnr, ssim
from fbanet_tpu.ops.flow import optical_flow
from fbanet_tpu.ops.registration import ecc_align, rgb_to_gray
from fbanet_tpu.ops.warp import warp_burst_homography, warp_flow


def _metrics(a: np.ndarray, b: np.ndarray, crop: int = 8) -> tuple[float, float]:
    aa = jnp.asarray(a)[None, crop:-crop, crop:-crop, :]
    bb = jnp.asarray(b)[None, crop:-crop, crop:-crop, :]
    return float(psnr(aa, bb)[0]), float(ssim(aa, bb)[0])


def compare_registrations(reference: np.ndarray, frame: np.ndarray,
                          *, methods: tuple[str, ...] = (
                              "flow", "translation", "euclidean",
                              "similarity", "affine", "homography")
                          ) -> dict[str, dict]:
    """Register `frame` onto `reference` with every method; return metrics.

    Both inputs are [H, W, C] float32 in [0, 1]. Mirrors the reference's
    per-method before/after PSNR/SSIM printout (sintel_pipeline.py:48-78).
    """
    results: dict[str, dict] = {}
    p0, s0 = _metrics(reference, frame)
    results["unaligned"] = {"psnr": p0, "ssim": s0, "seconds": 0.0}

    gray_ref = rgb_to_gray(jnp.asarray(reference))
    gray_frame = rgb_to_gray(jnp.asarray(frame))

    for method in methods:
        t0 = time.time()
        if method == "flow":
            fl = optical_flow(gray_ref, gray_frame, levels=4,
                              iters_per_level=6)
            warped = np.asarray(warp_flow(jnp.asarray(frame), fl))
        else:
            mat, _rho = ecc_align(gray_ref, gray_frame, motion=method,
                                  levels=3, iters_per_level=30)
            warped = np.asarray(warp_burst_homography(
                jnp.asarray(frame)[None], mat[None])[0])
        dt = time.time() - t0
        p, s = _metrics(reference, warped)
        results[method] = {"psnr": p, "ssim": s, "seconds": dt}
    return results


def run_bakeoff(frames: list[np.ndarray], ref_index: int = 0) -> None:
    reference = frames[ref_index]
    print(f"{'method':>12s} {'PSNR':>8s} {'SSIM':>7s} {'sec':>7s}")
    agg: dict[str, list[float]] = {}
    for i, frame in enumerate(frames):
        if i == ref_index:
            continue
        res = compare_registrations(reference, frame)
        print(f"--- frame {i} vs {ref_index}")
        for name, m in res.items():
            print(f"{name:>12s} {m['psnr']:8.3f} {m['ssim']:7.4f} "
                  f"{m['seconds']:7.3f}")
            agg.setdefault(name, []).append(m["psnr"])
    print("--- mean PSNR")
    for name, vals in agg.items():
        print(f"{name:>12s} {np.mean(vals):8.3f}")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="registration bake-off")
    p.add_argument("--frames", type=str, default="",
                   help="directory of frames (png), lexicographic order")
    p.add_argument("--ref", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="run on generated frames (no data needed)")
    args = p.parse_args(argv)

    if args.synthetic or not args.frames:
        from fbanet_tpu.data.synthetic import synthetic_burst

        lr, _hr, _ = synthetic_burst(np.random.default_rng(0), num_frames=4,
                                     lr_size=160, aligned=False, max_shift=4.0)
        frames = [f for f in lr]
    else:
        from fbanet_tpu.data.realbsr import _decode_png

        paths = sorted(Path(args.frames).glob("*.png"))
        frames = [_decode_png(q).astype(np.float32) / 255.0 for q in paths]
    run_bakeoff(frames, args.ref)


if __name__ == "__main__":
    main()
