"""Offline burst alignment CLI — `homography_alignment.py` made TPU-native.

The reference registered bursts with a Pool(16) of processes x 16 threads of
OpenCV ECC + warpAffine on CPU, one frame at a time
(reference: fba_net/homography_alignment.py:97-198). Here each burst's 13
non-reference frames are estimated and warped in one compiled on-device
program (`fbanet_tpu.ops.registration.align_burst`), and bursts stream
through with host decode/encode overlapped.

Semantics preserved:
- frame 00 is the registration target and passes through untouched,
- batch motion model defaults to translation — what the reference's batch
  path actually used despite its name (homography_alignment.py:97-98, §7.12)
  — with `--motion homography` matching its single-pair API,
- a frame whose registration fails (non-finite/uncorrelated result) is
  written unaligned (homography_alignment.py:142-144), via the identity
  fallback inside `ecc_align`,
- output tree mirrors the input (`LR_aligned/` layout) so the training
  datasets can consume it directly.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import numpy as np


def align_tree(input_dir: str | Path, output_dir: str | Path, *,
               motion: str = "translation", levels: int = 3,
               iters_per_level: int = 25, eps: float = 0.0,
               report_metrics: bool = True) -> int:
    """Align every burst directory under `input_dir`; returns #bursts done.

    Expects `input_dir/{burst}/...png` with frame-numbered LR files (either
    filename grammar); HR/warp files are ignored if present.
    """
    from PIL import Image

    from fbanet_tpu.data.realbsr import WARP_PATTERN, _decode_png
    from fbanet_tpu.metrics import psnr
    from fbanet_tpu.ops.registration import align_burst

    input_dir, output_dir = Path(input_dir), Path(output_dir)
    burst_dirs = sorted(p for p in input_dir.iterdir() if p.is_dir())

    aligner = None  # jit once per (F, H, W) shape
    import jax.numpy as jnp

    done = 0
    for burst_dir in burst_dirs:
        files = []
        for f in sorted(burst_dir.iterdir()):
            m = WARP_PATTERN.match(f.name)
            if m is not None and m["frame"] is None:
                continue  # HR frame
            if f.suffix.lower() == ".png":
                files.append(f)
        if len(files) < 2:
            print(f"skip {burst_dir.name}: <2 frames", file=sys.stderr)
            continue

        frames = np.stack([_decode_png(f) for f in files]).astype(np.float32) / 255.0
        burst = jnp.asarray(frames)

        if aligner is None:
            aligner = jax.jit(lambda b: align_burst(
                b, motion=motion, levels=levels,
                iters_per_level=iters_per_level, eps=eps))
        t0 = time.time()
        aligned, _mats, rhos = aligner(burst)
        aligned = np.asarray(aligned)
        dt = time.time() - t0

        out_b = output_dir / burst_dir.name
        out_b.mkdir(parents=True, exist_ok=True)
        for f, img in zip(files, aligned):
            arr = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(out_b / f.name)

        if report_metrics:
            # before/after PSNR vs frame 0 — the reference prints the same
            # diagnostic (homography_alignment.py:60-62)
            before = float(np.nanmean(np.asarray(psnr(
                jnp.asarray(frames[1:]), jnp.asarray(frames[:1])))))
            after = float(np.nanmean(np.asarray(psnr(
                jnp.asarray(aligned[1:]), jnp.asarray(frames[:1])))))
            print(f"{burst_dir.name}: {len(files)} frames in {dt:.3f}s  "
                  f"PSNR vs ref {before:.2f} -> {after:.2f} dB  "
                  f"min rho {float(np.min(np.asarray(rhos))):.4f}",
                  file=sys.stderr)
        done += 1
    return done


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="on-device burst alignment")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--motion", default="translation",
                   choices=["translation", "euclidean", "affine", "homography"])
    p.add_argument("--levels", type=int, default=3)
    p.add_argument("--iters", type=int, default=25)
    p.add_argument("--eps", type=float, default=0.0,
                   help="ECC termination on the correlation increment "
                        "(cv2 TermCriteria eps; the reference uses 1e-10). "
                        "0 = fixed iteration count")
    args = p.parse_args(argv)
    n = align_tree(args.input_dir, args.output_dir, motion=args.motion,
                   levels=args.levels, iters_per_level=args.iters,
                   eps=args.eps)
    print(f"aligned {n} bursts -> {args.output_dir}")


if __name__ == "__main__":
    main()
