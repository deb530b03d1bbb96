"""Measure the reference's per-burst CPU alignment cost on this machine.

Reproduces the exact OpenCV call sequence of the reference's batch
alignment path — grayscale conversion, `cv2.findTransformECC` with
MOTION_TRANSLATION / 100 iterations / eps 1e-10, then `warpAffine` with
WARP_INVERSE_MAP (`fba_net/homography_alignment.py:97-129`) — on a
synthetic 14-frame 160px burst. The measured ms/burst anchors the
`vs_baseline` derivation in BASELINE.md.
"""

from __future__ import annotations

import time

import cv2
import numpy as np

from fbanet_tpu.data.synthetic import synthetic_burst


def main() -> None:
    rng = np.random.default_rng(0)
    lr, _hr, _shifts = synthetic_burst(rng, num_frames=14, lr_size=160,
                                       aligned=False, max_shift=3.0)
    gray = [cv2.cvtColor((f * 255).astype(np.uint8),
                         cv2.COLOR_RGB2GRAY).astype(np.float32) / 255
            for f in lr]
    crit = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-10)

    t0 = time.time()
    n = 0
    for _rep in range(3):
        for k in range(1, 14):
            warp = np.eye(2, 3, dtype=np.float32)
            try:
                _cc, warp = cv2.findTransformECC(
                    gray[0], gray[k], warp, cv2.MOTION_TRANSLATION, crit)
            except cv2.error:
                pass  # reference falls back to the unaligned frame (:142-144)
            cv2.warpAffine(lr[k], warp, (160, 160),
                           flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)
            n += 1
    dt = time.time() - t0
    per_frame = dt / n
    print(f"reference ECC alignment: {per_frame * 1e3:.1f} ms/frame "
          f"-> {13 * per_frame * 1e3:.0f} ms/burst on one CPU core")
    print(f"with the reference's Pool(16): "
          f"~{16 / (13 * per_frame):.1f} bursts/s machine-wide")


if __name__ == "__main__":
    main()
