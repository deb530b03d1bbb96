"""Offline burst alignment CLI — `homography_alignment.py` made TPU-native.

The reference registered bursts with a Pool(16) of processes x 16 threads of
OpenCV ECC + warpAffine on CPU, one frame at a time
(reference: fba_net/homography_alignment.py:97-198). Here each burst's 13
non-reference frames are estimated and warped in one compiled on-device
program (`fbanet_tpu.ops.registration.align_burst`), and the host work is
software-pipelined around the device: each loop iteration decodes burst N,
dispatches its alignment (JAX dispatch is async), then finalizes and
PNG-encodes burst N-1 while the device works on N — so decode and encode
both overlap device compute instead of serializing with it (measured on a
16-burst tree: docs/ROUND4.md).

Semantics preserved:
- frame 00 is the registration target and passes through untouched,
- batch motion model defaults to translation — what the reference's batch
  path actually used despite its name (homography_alignment.py:97-98, §7.12)
  — with `--motion homography` matching its single-pair API,
- a frame whose registration fails (non-finite/uncorrelated result) is
  written unaligned (homography_alignment.py:142-144), via the identity
  fallback inside `ecc_align`,
- `--parity` runs the reference's exact cv2 TermCriteria settings (single
  level, 100 iterations, eps 1e-10 — homography_alignment.py:38-44);
  the shipped default (3-level pyramid x 25 iters) converges at least as
  accurately in fewer device iterations (docs/ROUND4.md parity table),
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

# The reference's cv2.findTransformECC TermCriteria
# (fba_net/homography_alignment.py:38-44).
PARITY_LEVELS = 1
PARITY_ITERS = 100
PARITY_EPS = 1e-10


def _burst_files(burst_dir: Path) -> list[Path]:
    """Frame-numbered LR PNGs of one burst directory (HR files skipped)."""
    from fbanet_tpu.data.realbsr import WARP_PATTERN

    files = []
    for f in sorted(burst_dir.iterdir()):
        m = WARP_PATTERN.match(f.name)
        if m is not None and m["frame"] is None:
            continue  # HR frame
        if f.suffix.lower() == ".png":
            files.append(f)
    return files


def align_tree(input_dir: str | Path, output_dir: str | Path, *,
               motion: str = "translation", levels: int = 3,
               iters_per_level: int = 25, eps: float = 0.0,
               report_metrics: bool = True, overlap: bool = True) -> int:
    """Align every burst directory under `input_dir`; returns #bursts done.

    Expects `input_dir/{burst}/...png` with frame-numbered LR files (either
    filename grammar); HR/warp files are ignored if present. `overlap=False`
    forces the serial decode->align->encode loop (A/B harness for the
    pipelined default).
    """
    from PIL import Image

    import jax.numpy as jnp

    from fbanet_tpu.data.realbsr import _decode_png
    from fbanet_tpu.metrics import psnr
    from fbanet_tpu.ops.registration import align_burst

    input_dir, output_dir = Path(input_dir), Path(output_dir)
    burst_dirs = sorted(p for p in input_dir.iterdir() if p.is_dir())

    aligner = jax.jit(lambda b: align_burst(
        b, motion=motion, levels=levels,
        iters_per_level=iters_per_level, eps=eps))

    def decode(burst_dir: Path):
        files = _burst_files(burst_dir)
        if len(files) < 2:
            print(f"skip {burst_dir.name}: <2 frames", file=sys.stderr)
            return None
        frames = np.stack([_decode_png(f)
                           for f in files]).astype(np.float32) / 255.0
        return files, frames

    def finalize(pending) -> None:
        """Block on the device result, PNG-encode, report metrics."""
        burst_dir, files, frames, aligned_dev, rhos_dev, t0 = pending
        aligned = np.asarray(aligned_dev)  # blocks until device done
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
                  f"min rho {float(np.min(np.asarray(rhos_dev))):.4f}",
                  file=sys.stderr)

    done = 0
    pending = None  # previous burst, in flight on the device
    for burst_dir in burst_dirs:
        decoded = decode(burst_dir)  # host: overlaps the in-flight align
        if decoded is None:
            continue
        files, frames = decoded
        t0 = time.time()
        aligned, _mats, rhos = aligner(jnp.asarray(frames))  # async dispatch
        if pending is not None:
            finalize(pending)  # host encode of N-1 overlaps align of N
        pending = (burst_dir, files, frames, aligned, rhos, t0)
        if not overlap:
            finalize(pending)
            pending = None
        done += 1
    if pending is not None:
        finalize(pending)
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
    p.add_argument("--parity", action="store_true",
                   help="use the reference's exact ECC settings (single "
                        "level, 100 iters, eps 1e-10 — overrides "
                        "--levels/--iters/--eps)")
    p.add_argument("--no_overlap", action="store_true",
                   help="serial decode->align->encode (A/B harness for the "
                        "pipelined default)")
    args = p.parse_args(argv)
    levels, iters, eps = args.levels, args.iters, args.eps
    if args.parity:
        levels, iters, eps = PARITY_LEVELS, PARITY_ITERS, PARITY_EPS
    n = align_tree(args.input_dir, args.output_dir, motion=args.motion,
                   levels=levels, iters_per_level=iters, eps=eps,
                   overlap=not args.no_overlap)
    print(f"aligned {n} bursts -> {args.output_dir}")


if __name__ == "__main__":
    main()
