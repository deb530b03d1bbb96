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
        def run():
            if method == "flow":
                fl = optical_flow(gray_ref, gray_frame, levels=4,
                                  iters_per_level=6)
                return np.asarray(warp_flow(jnp.asarray(frame), fl))
            mat, _rho = ecc_align(gray_ref, gray_frame, motion=method,
                                  levels=3, iters_per_level=30)
            return np.asarray(warp_burst_homography(
                jnp.asarray(frame)[None], mat[None])[0])

        warped = run()  # first call pays compilation
        t0 = time.time()
        warped = run()
        dt = time.time() - t0
        p, s = _metrics(reference, warped)
        results[method] = {"psnr": p, "ssim": s, "seconds": dt}
    return results


def run_bakeoff(frames: list[np.ndarray], ref_index: int = 0
                ) -> dict[str, dict[str, float]]:
    """Register every frame onto frames[ref_index] with every method.
    Returns {method: {psnr, ssim, seconds}} aggregated over frames."""
    reference = frames[ref_index]
    print(f"{'method':>12s} {'PSNR':>8s} {'SSIM':>7s} {'sec':>7s}")
    agg: dict[str, list[dict]] = {}
    for i, frame in enumerate(frames):
        if i == ref_index:
            continue
        res = compare_registrations(reference, frame)
        print(f"--- frame {i} vs {ref_index}")
        for name, m in res.items():
            print(f"{name:>12s} {m['psnr']:8.3f} {m['ssim']:7.4f} "
                  f"{m['seconds']:7.3f}")
            agg.setdefault(name, []).append(m)
    print("--- mean PSNR")
    out = {}
    for name, ms in agg.items():
        out[name] = {k: float(np.mean([m[k] for m in ms]))
                     for k in ("psnr", "ssim", "seconds")}
        print(f"{name:>12s} {out[name]['psnr']:8.3f}")
    return out


def synthetic_scene(motion: str, seed: int = 0, size: int = 160,
                    num_frames: int = 4) -> list[np.ndarray]:
    """Frames under a named motion model (numpy-resampled — independent of
    the repo's own warp kernels)."""
    from fbanet_tpu.data.synthetic import (
        affine_sample,
        rotation_zoom_matrix,
        smooth_image,
        synthetic_burst,
    )

    rng = np.random.default_rng(seed)
    if motion == "translation":
        lr, _hr, _ = synthetic_burst(rng, num_frames=num_frames, lr_size=size,
                                     aligned=False, max_shift=4.0)
        return [f for f in lr]
    ref = smooth_image(rng, size, size)
    frames = [ref]
    for _ in range(num_frames - 1):
        if motion == "rotation":
            m = rotation_zoom_matrix(size, size,
                                     angle_deg=float(rng.uniform(-3, 3)),
                                     dy=float(rng.uniform(-2, 2)),
                                     dx=float(rng.uniform(-2, 2)))
        elif motion == "zoom":
            m = rotation_zoom_matrix(size, size,
                                     zoom=float(rng.uniform(0.96, 1.04)),
                                     dy=float(rng.uniform(-2, 2)),
                                     dx=float(rng.uniform(-2, 2)))
        else:
            raise ValueError(f"unknown motion {motion}")
        f = affine_sample(ref, m)
        f = np.clip(f + 0.01 * rng.standard_normal(f.shape), 0, 1)
        frames.append(f.astype(np.float32))
    return frames


def write_markdown(results: dict[str, dict[str, dict[str, float]]],
                   path: str) -> None:
    """{scene: {method: metrics}} -> a committed markdown table."""
    lines = [
        "# Registration bake-off (synthetic scenes)",
        "",
        "Produced by `python -m fbanet_tpu.bakeoff --synthetic --markdown "
        "docs/BAKEOFF.md` — the framework equivalent of the reference's "
        "sintel_pipeline.py harness (fba_net/sintel_pipeline.py:48-78).",
        "Frames are numpy-resampled ground-truth motions (independent of the "
        "repo's warp kernels). PSNR/SSIM on the central crop after "
        "registering each frame onto frame 0; seconds are per-frame "
        "wall-clock on the benchmarking device (dispatch overhead included).",
        "",
    ]
    for scene, methods in results.items():
        lines += [f"## {scene}", "",
                  "| method | PSNR (dB) | SSIM | sec/frame |",
                  "|---|---|---|---|"]
        for name, m in methods.items():
            lines.append(f"| {name} | {m['psnr']:.3f} | {m['ssim']:.4f} | "
                         f"{m['seconds']:.3f} |")
        lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="registration bake-off")
    p.add_argument("--frames", type=str, default="",
                   help="directory of frames (png), lexicographic order")
    p.add_argument("--ref", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="run on generated frames (no data needed)")
    p.add_argument("--markdown", type=str, default="",
                   help="also write the aggregated table to this .md file")
    p.add_argument("--size", type=int, default=160)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the harness dispatches many "
                   "small unjitted ops; over a tunneled TPU each dispatch "
                   "pays a host round-trip)")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.synthetic or not args.frames:
        results = {}
        for motion in ("translation", "rotation", "zoom"):
            print(f"===== scene: {motion} =====")
            results[motion] = run_bakeoff(
                synthetic_scene(motion, size=args.size), 0)
        if args.markdown:
            write_markdown(results, args.markdown)
    else:
        from fbanet_tpu.data.realbsr import _decode_png

        paths = sorted(Path(args.frames).glob("*.png"))
        frames = [_decode_png(q).astype(np.float32) / 255.0 for q in paths]
        results = run_bakeoff(frames, args.ref)
        if args.markdown:
            write_markdown({"frames": results}, args.markdown)


if __name__ == "__main__":
    main()
