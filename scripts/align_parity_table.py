"""Transform-accuracy parity table: our ECC vs cv2.findTransformECC.

VERDICT r3 weak #6: the CLI ships 3-level x 25-iter ECC (eps 0) while the
reference runs single-level 100-iter eps 1e-10 per frame
(fba_net/homography_alignment.py:38-44); the cv2 cross-check tests pass at
test settings, but no committed table showed transform accuracy at the
shipped defaults vs cv2 at the reference's settings on the same bursts.

This script builds N smooth synthetic frames with known subpixel
translations (the same construction as tests/test_registration.py — warped
with our own bilinear warp so ground truth is exact), recovers each shift
three ways on the SAME pixels, and prints mean/max |recovered - true| px:

  ours-default : ecc_align, levels=3, iters=25, eps=0   (align.py default)
  ours-parity  : ecc_align, levels=1, iters=100, eps=1e-10  (--parity)
  cv2-reference: cv2.findTransformECC, MOTION_TRANSLATION, (100, 1e-10)

Runs on CPU (forced) — pure math comparison, no TPU time needed.
Usage: python scripts/align_parity_table.py   (~2 min)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fbanet_tpu.ops.registration import ecc_align
from fbanet_tpu.ops.warp import warp_burst_homography


def smooth_image(h, w, seed):
    rng = np.random.default_rng(seed)
    small = rng.uniform(size=(h // 8, w // 8)).astype(np.float32)
    return np.asarray(jax.image.resize(jnp.asarray(small), (h, w),
                                       method="bicubic"))


def main() -> None:
    import cv2

    n, size = 24, 160
    rng = np.random.default_rng(42)
    errs = {"ours-default": [], "ours-parity": [], "cv2-reference": []}

    ours_default = jax.jit(lambda a, b: ecc_align(
        a, b, motion="translation", levels=3, iters_per_level=25, eps=0.0))
    ours_parity = jax.jit(lambda a, b: ecc_align(
        a, b, motion="translation", levels=1, iters_per_level=100,
        eps=1e-10))

    for i in range(n):
        img = smooth_image(size, size, seed=i)
        tx, ty = rng.uniform(-3.0, 3.0, size=2)
        mat = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float32)
        moved = np.asarray(warp_burst_homography(
            jnp.asarray(img)[None, ..., None], jnp.asarray(mat)[None])[0, ..., 0])
        # the aligning translation is the inverse of the forward warp
        true = np.array([-tx, -ty], np.float32)

        m, _ = ours_default(jnp.asarray(img), jnp.asarray(moved))
        errs["ours-default"].append(np.abs(np.asarray(m)[:2, 2] - true))
        m, _ = ours_parity(jnp.asarray(img), jnp.asarray(moved))
        errs["ours-parity"].append(np.abs(np.asarray(m)[:2, 2] - true))

        warp = np.eye(2, 3, dtype=np.float32)
        try:
            _, warp = cv2.findTransformECC(
                img, moved, warp, cv2.MOTION_TRANSLATION,
                (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-10))
            errs["cv2-reference"].append(np.abs(warp[:2, 2] - true))
        except cv2.error:
            print(f"burst {i}: cv2 did not converge", file=sys.stderr)

    print(f"| method | mean err (px) | max err (px) | n |")
    print(f"|---|---|---|---|")
    for k, v in errs.items():
        v = np.concatenate(v)
        print(f"| {k} | {v.mean():.4f} | {v.max():.4f} | {len(v) // 2} |")


if __name__ == "__main__":
    main()
