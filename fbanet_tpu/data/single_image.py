"""Single-image restoration datasets (SIDD-style) + patch extraction.

The reference inherited a full single-image denoising data path from the
Uformer codebase it derives from: paired clean/noisy loaders with random
crops and the 8 dihedral augmentations (reference: fba_net/dataset.py —
DataLoaderTrain/Val/Test/TestSR) and a random-patch extraction script
(reference: fba_net/generate_patches_SIDD.py). They are vestigial for burst
SR but part of the component inventory (SURVEY.md §2.2); this module provides
the same capabilities on the framework's loader infrastructure.

Directory layout (same as the reference's SIDD convention):
    root/groundtruth/*.png   (clean)
    root/input/*.png         (noisy / degraded)
paired by sorted order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from fbanet_tpu.data.realbsr import _decode_png, dihedral_transform


@dataclass
class PairedImageDataset:
    """Clean/noisy image pairs with random crop + dihedral augmentation
    (reference: fba_net/dataset.py DataLoaderTrain/DataLoaderVal)."""

    root: str | Path
    split: str = "train"  # train: random crop + augment; val/test: center crop
    patch_size: int = 128  # 0 = full images
    gt_dir: str = "groundtruth"
    input_dir: str = "input"
    seed: int = 0

    pairs: list[tuple[Path, Path]] = field(init=False)

    def __post_init__(self) -> None:
        root = Path(self.root)
        gts = sorted((root / self.gt_dir).glob("*.png"))
        ins = sorted((root / self.input_dir).glob("*.png"))
        assert len(gts) == len(ins) and gts, (
            f"unpaired/empty dataset under {root}")
        self.pairs = list(zip(gts, ins))

    def __len__(self) -> int:
        return len(self.pairs)

    def load(self, index: int, rng: np.random.Generator | None = None) -> dict:
        rng = rng or np.random.default_rng(self.seed)
        gt_path, in_path = self.pairs[index]
        gt = _decode_png(gt_path).astype(np.float32) / 255.0
        noisy = _decode_png(in_path).astype(np.float32) / 255.0
        ps = self.patch_size
        if ps and gt.shape[0] >= ps and gt.shape[1] >= ps:
            if self.split == "train":
                r = int(rng.integers(0, gt.shape[0] - ps + 1))
                c = int(rng.integers(0, gt.shape[1] - ps + 1))
            else:
                r = (gt.shape[0] - ps) // 2
                c = (gt.shape[1] - ps) // 2
            gt = gt[r:r + ps, c:c + ps]
            noisy = noisy[r:r + ps, c:c + ps]
        if self.split == "train":
            t = int(rng.integers(0, 8))
            gt = dihedral_transform(gt, t)
            noisy = dihedral_transform(noisy, t)
        return {"gt": gt, "input": noisy, "name": gt_path.stem}


def generate_patches(
    src_dir: str | Path,
    dst_dir: str | Path,
    *,
    patch_size: int = 256,
    patches_per_image: int = 8,
    seed: int = 0,
    workers: int = 8,
) -> int:
    """Extract random patches from every PNG under `src_dir` into `dst_dir`.

    Reference: fba_net/generate_patches_SIDD.py (random 256px patches,
    joblib-parallel). Returns the number of patches written.
    """
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    src, dst = Path(src_dir), Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    files = sorted(src.glob("*.png"))

    def one(args: tuple[int, Path]) -> int:
        idx, path = args
        rng = np.random.default_rng((seed, idx))
        img = _decode_png(path)
        h, w = img.shape[:2]
        n = 0
        for k in range(patches_per_image):
            if h < patch_size or w < patch_size:
                break
            r = int(rng.integers(0, h - patch_size + 1))
            c = int(rng.integers(0, w - patch_size + 1))
            patch = img[r:r + patch_size, c:c + patch_size]
            Image.fromarray(patch).save(dst / f"{path.stem}_{k:02d}.png")
            n += 1
        return n

    with ThreadPoolExecutor(workers) as pool:
        counts = list(pool.map(one, enumerate(files)))
    return sum(counts)


def bundle_submission(
    result_dir: str | Path,
    out_dir: str | Path,
    *,
    blocks_per_image: int = 32,
) -> Path:
    """Package per-block restoration outputs into per-image .mat bundles.

    Reference: fba_net/utils/bundle_submissions.py (SIDD benchmark
    packaging: srgb results saved as `{idx:04d}_{block:02d}.png` ->
    `{idx:04d}.mat` holding a [1, blocks] object array of uint8 blocks).
    Written with scipy when available, else the vendored MAT5 writer
    (fbanet_tpu.utils.mat5) — byte-compatible for this array shape.
    """
    try:
        from scipy import io as sio

        savemat = sio.savemat
    except ImportError:
        from fbanet_tpu.utils.mat5 import savemat

    result_dir, out_dir = Path(result_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(result_dir.glob("*.png"))
    by_image: dict[str, list[Path]] = {}
    for f in files:
        img_id = f.stem.split("_")[0]
        by_image.setdefault(img_id, []).append(f)

    for img_id, paths in sorted(by_image.items()):
        blocks = np.empty((1, len(paths)), dtype=object)
        for i, p in enumerate(sorted(paths)):
            blocks[0, i] = _decode_png(p)
        savemat(out_dir / f"{img_id}.mat", {"results": blocks})
    return out_dir
