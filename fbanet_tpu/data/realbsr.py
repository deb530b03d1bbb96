"""RealBSR burst dataset: filename grammar, sharding, cropping, augmentation.

Reproduces the semantics of both reference dataset implementations as one
class:

- directory layouts & filename grammar: "aligned"
  (`{split}/LR_aligned/{burst}/{scene}_MFSR_Sony_{patch:04d}_x1_{frame:02d}.png`,
  `{split}/HR/{burst}/{scene}_MFSR_Sony_{patch:04d}_x4.png`; reference:
  fba_net/ManualDataset.py.bak:56-103) and "warp" (one directory per burst
  holding `..._x{s}_{f:02d}.png` + `..._x{s}warp.png`; reference:
  fba_net/pipeline/real_bsr_dataset.py:40-55),
- deterministic per-epoch permutation keyed by `seed + epoch`
  (reference: real_bsr_dataset.py:59-70),
- shard_id/num_shards slicing with drop-remainder semantics
  (reference: real_bsr_dataset.py:82-87) — on TPU pods feed
  `shard_id=jax.process_index()`,
- train-time random frame subset that always keeps frame 0
  (reference: ManualDataset.py.bak:112-116),
- coupled LR/HR random crop and one of 8 burst-consistent dihedral
  augmentations (reference: ManualDataset.py.bak:125-148,
  fba_net/utils/dataset_utils.py:184-217).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

# The DALI-tree grammar (reference: fba_net/pipeline/real_bsr_dataset.py:40-55).
WARP_PATTERN = re.compile(
    r"^(?P<scene>\d{3})_MFSR_Sony_(?P<patch>\d{4})_x(?P<scale>\d)"
    r"(?:_(?P<frame>\d{2})|warp)\.png$"
)


def _decode_png(path: Path) -> np.ndarray:
    """PNG -> uint8 HWC RGB. cv2 (C++, releases the GIL) when available —
    this is the nvJPEG replacement's decode core (SURVEY.md §2.4 N5)."""
    try:
        import cv2

        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is None:
            raise OSError(f"failed to decode {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:  # pragma: no cover
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


def _decode_png_raw(path: Path) -> np.ndarray:
    """16-bit packed-Bayer PNG -> f32 [H, W, 4] in [0, 1] (/16383).

    The RealBSR-RAW storage format the reference's visualization path reads:
    a 4-channel 16-bit PNG of the packed RGGB mosaic, normalized by 16383
    (reference: fba_net/utils/post_processing_vis.py:104-110 —
    cv2.IMREAD_UNCHANGED then /16383)."""
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise OSError(f"failed to decode {path}")
    if img.ndim != 3 or img.shape[-1] != 4:
        raise OSError(f"expected a 4-channel packed-Bayer PNG, got "
                      f"{img.shape} in {path}")
    return img.astype(np.float32) / 16383.0


def dihedral_transform(img: np.ndarray, idx: int) -> np.ndarray:
    """One of the 8 rotation/flip augmentations, numbered like the
    reference's Augment_RGB_torch.transform{0..7}
    (fba_net/utils/dataset_utils.py:184-217): idx%4 = #rot90, idx>=4 = flip.
    Operates on [..., H, W, C]."""
    k = idx % 4
    out = np.rot90(img, k=k, axes=(-2, -3)) if k else img
    if idx >= 4:
        out = np.flip(out, axis=-3)
    return np.ascontiguousarray(out)


@dataclass
class BurstRecord:
    name: str
    lr_paths: list[Path]
    # None for GT-free test bursts (the reference's ManualDatasets_test reads
    # LR only, fba_net/ManualDataset.py.bak:295-408)
    hr_path: Path | None


@dataclass
class RealBSRDataset:
    """Index over a RealBSR tree plus sample assembly (decode/crop/augment).

    `__getitem__`-style access is via `load(index, rng)`; ordering, epochs
    and sharding are handled by `epoch_indices`.
    """

    root: str | Path
    split: str = "train"  # train | val | test ("val" reads the test split,
    # mirroring ManualDataset.py.bak:57-60)
    layout: str = "aligned"  # aligned | warp
    burst_size: int = 14
    crop_size: int = 160  # LR-space patch (--train_ps); 0 = no crop
    scale: int = 4
    # 3 = RGB 8-bit PNGs (/255); 4 = RealBSR-RAW packed-Bayer RGGB 16-bit
    # PNGs (/16383, the reference's RAW storage format —
    # post_processing_vis.py:104-110). Same tree grammar either way.
    channels: int = 3
    augment: bool = True
    random_frame_subset: bool = True
    seed: int = 0
    shard_id: int = 0
    num_shards: int = 1
    # Decoded-frame RAM cache: PNG decode runs once per burst (storage dtype,
    # uint8/uint16); later epochs skip decode entirely and assemble samples
    # through the native gather+crop+dihedral+normalize pass. This is the
    # single-core answer to DALI's decode executor (SURVEY.md §2.4 N5/N6):
    # this host has 1 CPU, so thread scaling cannot hide PNG decode — the
    # cache removes it from the steady-state path instead. Bounded by
    # `cache_limit_bytes`; past the cap, bursts decode per epoch as before.
    cache_decoded: bool = False
    cache_limit_bytes: int = 8 << 30
    # Sample dtype on the host->device wire: "float32" = normalized [0,1]
    # floats (the classic contract); "storage" = the PNG storage integers
    # (uint8 /255, RAW uint16 /16383) with normalization deferred to the
    # device (train.to_unit_f32 inside the jitted step). 4x fewer wire
    # bytes per batch — on a tunneled/remote device the f32 transfer
    # dominated the train step (measured 1.5 s/step at B8 160px vs 250 ms
    # compute, docs/ROUND4.md); on local hosts it still quarters PCIe
    # traffic. Bit-exact: the device multiply is the same f32 op the host
    # normalize performs.
    wire_dtype: str = "float32"  # float32 | storage

    records: list[BurstRecord] = field(init=False)

    def __post_init__(self) -> None:
        import threading

        self._cache: dict[int, tuple] = {}
        self._cache_lock = threading.Lock()
        self._cache_bytes = 0
        root = Path(self.root)
        self.records = []
        if self.layout == "aligned":
            split_dir = root / ("test" if self.split in ("val", "test") else "train")
            lr_root, hr_root = split_dir / "LR_aligned", split_dir / "HR"
            for burst_dir in sorted(p for p in lr_root.iterdir() if p.is_dir()):
                scene = burst_dir.name.split("_")[0]
                patch = int(burst_dir.name.split("_")[-1])
                # scan what exists rather than constructing names blindly:
                # frame files sort lexicographically by frame number
                lr_paths = sorted(burst_dir.glob("*_x1_*.png"))
                if not lr_paths:  # fall back to any frame-numbered grammar
                    lr_paths = sorted(
                        f for f in burst_dir.glob("*.png")
                        if WARP_PATTERN.match(f.name)
                        and WARP_PATTERN.match(f.name)["frame"] is not None)
                if not lr_paths:
                    raise FileNotFoundError(f"no LR frames in {burst_dir}")
                hr_path = (hr_root / burst_dir.name
                           / f"{scene}_MFSR_Sony_{patch:04d}_x4.png")
                if not hr_path.exists():
                    # GT-free burst: allowed for the test split only
                    # (reference: ManualDataset.py.bak:295-408 reads no HR)
                    if self.split != "test":
                        raise FileNotFoundError(
                            f"missing HR frame {hr_path} (split={self.split}; "
                            f"GT-free trees are only valid with split='test')")
                    hr_path = None
                self.records.append(BurstRecord(burst_dir.name, lr_paths, hr_path))
        elif self.layout == "warp":
            for burst_dir in sorted(p for p in root.iterdir() if p.is_dir()):
                lr_paths: list[Path] = []
                hr_path: Path | None = None
                for f in sorted(burst_dir.iterdir()):
                    m = WARP_PATTERN.match(f.name)
                    if m is None:
                        continue
                    if m["frame"] is None:
                        hr_path = f
                    elif len(lr_paths) < self.burst_size:
                        lr_paths.append(f)
                if hr_path is None and self.split != "test":
                    raise FileNotFoundError(f"no HR frame in {burst_dir}")
                self.records.append(BurstRecord(burst_dir.name, lr_paths, hr_path))
        else:
            raise ValueError(f"unknown layout {self.layout}")
        if not self.records:
            raise FileNotFoundError(f"no bursts found under {root}")

    # --- ordering / sharding -------------------------------------------------

    def __len__(self) -> int:
        return len(self.records)

    @property
    def shard_size(self) -> int:
        # drop-remainder sharding (reference: real_bsr_dataset.py:82-87)
        return len(self.records) // self.num_shards

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """Deterministic permutation for `epoch`, sliced to this shard
        (reference: real_bsr_dataset.py:59-70 uses rng(seed + epoch))."""
        perm = np.random.default_rng(self.seed + epoch).permutation(
            len(self.records))
        if self.split != "train":
            perm = np.arange(len(self.records))
        start = self.shard_size * self.shard_id
        return perm[start:start + self.shard_size]

    # --- sample assembly -----------------------------------------------------

    def _decode_burst(self, lr_paths: list[Path], hr_path: Path | None
                      ) -> tuple[np.ndarray, np.ndarray | None]:
        """Decode one burst's LR frames (+ HR frame if present) as f32 [0,1].

        Uses the native libpng decode pool (native/burstio.cc — the DALI
        decode-executor replacement) when available: the whole burst decodes
        in one parallel call. Falls back to cv2/PIL per file. Image
        dimensions are probed once and cached.
        """
        if self.channels == 4:
            # RAW packed-Bayer: 16-bit decode (cv2, per file; the native
            # libpng pool is 8-bit RGB only)
            lr = np.stack([_decode_png_raw(p) for p in lr_paths])
            hr = _decode_png_raw(hr_path) if hr_path is not None else None
            return lr, hr

        from fbanet_tpu.data import native_io

        if native_io.available():
            if not hasattr(self, "_probe_dims"):
                probe_lr = _decode_png(lr_paths[0])
                probe_hr = _decode_png(hr_path) if hr_path else None
                self._probe_dims = (
                    probe_lr.shape[:2],
                    probe_hr.shape[:2] if probe_hr is not None else None)
            (lh, lw), hr_dims = self._probe_dims
            try:
                # fused /255 f32 decode in C++ (GIL-free): the Python-side
                # uint8->f32 conversion was the loader's throughput ceiling
                # (numpy holds the GIL, serializing all worker threads)
                lr = native_io.decode_files(lr_paths, lh, lw, as_float=True)
                hr = None
                if hr_path is not None:
                    if hr_dims is None:  # mixed GT/GT-free tree: probe now
                        hr_dims = _decode_png(hr_path).shape[:2]
                        self._probe_dims = ((lh, lw), hr_dims)
                    hr = native_io.decode_files([hr_path], hr_dims[0],
                                                hr_dims[1], as_float=True)[0]
                return lr, hr
            except OSError:
                pass  # odd-sized or corrupt file: per-file fallback below
        lr = np.stack([_decode_png(p) for p in lr_paths]).astype(np.float32) / 255.0
        hr = (_decode_png(hr_path).astype(np.float32) / 255.0
              if hr_path is not None else None)
        return lr, hr

    def _cached_frames(self, index: int) -> tuple[np.ndarray, np.ndarray | None]:
        """All-frame storage-dtype decode of record `index`, RAM-memoized.

        A concurrent-miss race can decode a burst twice (both results are
        identical; one wins the cache slot) — cheaper than a per-index lock.
        """
        hit = self._cache.get(index)
        if hit is not None:
            return hit
        rec = self.records[index]
        if self.channels == 4:
            lr = np.stack([np.asarray(
                _decode_png_raw(p) * 16383.0 + 0.5, np.uint16)
                for p in rec.lr_paths])
            hr = (np.asarray(_decode_png_raw(rec.hr_path) * 16383.0 + 0.5,
                             np.uint16) if rec.hr_path is not None else None)
        else:
            from fbanet_tpu.data import native_io

            lr = hr = None
            if native_io.available():
                # probe image dims once per dataset (same pattern as
                # _decode_burst): decoding probes per burst doubled the
                # cold-epoch cost
                if not hasattr(self, "_probe_dims"):
                    probe_lr = _decode_png(rec.lr_paths[0])
                    probe_hr = (_decode_png(rec.hr_path)
                                if rec.hr_path else None)
                    self._probe_dims = (
                        probe_lr.shape[:2],
                        probe_hr.shape[:2] if probe_hr is not None else None)
                (lh, lw), hr_dims = self._probe_dims
                try:
                    lr = native_io.decode_files(rec.lr_paths, lh, lw,
                                                as_float=False)
                    if rec.hr_path is not None:
                        if hr_dims is None:  # mixed GT-free tree: probe now
                            hr_dims = _decode_png(rec.hr_path).shape[:2]
                            self._probe_dims = ((lh, lw), hr_dims)
                        hr = native_io.decode_files(
                            [rec.hr_path], hr_dims[0], hr_dims[1],
                            as_float=False)[0]
                except OSError:
                    lr = None
            if lr is None:
                lr = np.stack([_decode_png(p) for p in rec.lr_paths])
                hr = (_decode_png(rec.hr_path)
                      if rec.hr_path is not None else None)
        entry = (lr, hr)
        nbytes = lr.nbytes + (hr.nbytes if hr is not None else 0)
        with self._cache_lock:
            if self._cache_bytes + nbytes <= self.cache_limit_bytes:
                if index not in self._cache:
                    self._cache[index] = entry
                    self._cache_bytes += nbytes
        return entry

    def warm_cache(self) -> int:
        """Decode every record into the RAM cache up front (`--warm_start`).

        On 1-core hosts the decode-bound first epoch otherwise starves the
        device (~1/4 of the train rate, docs/ROUND3.md); pre-filling moves
        that cost ahead of step 1 so every training epoch runs at the cached
        steady-state rate. Returns the number of cached bursts (bounded by
        `cache_limit_bytes` — records past the limit stay decode-on-load)."""
        if not self.cache_decoded:
            return 0
        for i in range(len(self.records)):
            self._cached_frames(i)
        return len(self._cache)

    def _storage_to_f32(self, arr: np.ndarray) -> np.ndarray:
        scale = np.float32(1.0 / 16383.0 if self.channels == 4
                           else 1.0 / 255.0)
        return arr.astype(np.float32) * scale

    def load(self, index: int, rng: np.random.Generator | None = None
             ) -> dict[str, np.ndarray | str]:
        """Decode, frame-subset, crop and augment one burst.

        Returns {'LR': [F,h,w,C], 'HR': [H,W,C], 'burst_name'} — f32 [0,1]
        under wire_dtype="float32", storage integers (uint8/uint16) under
        "storage" (normalize on device with train.to_unit_f32). GT-free test
        bursts return {'LR', 'burst_name'} only (the reference's
        ManualDatasets_test contract, fba_net/ManualDataset.py.bak:295-408).

        With `cache_decoded`, decode happens once per burst and sample
        assembly (gather selected frames + crop + dihedral + /255) runs as
        one native pass — the rng draw order is identical to the uncached
        path, so (seed, epoch, position)-keyed sample streams match exactly.
        """
        rec = self.records[index]
        rng = rng or np.random.default_rng(self.seed)

        frame_ids = list(range(len(rec.lr_paths)))
        if self.random_frame_subset and self.split == "train" and \
                self.burst_size < len(rec.lr_paths):
            rest = rng.choice(np.arange(1, len(rec.lr_paths)),
                              size=self.burst_size - 1, replace=False)
            frame_ids = [0, *sorted(int(i) for i in rest)]
        else:
            frame_ids = frame_ids[: self.burst_size]

        if self.cache_decoded:
            lr_all, hr_st = self._cached_frames(index)
            lr_h, lr_w = lr_all.shape[1:3]
            cs = self.crop_size
            crop = bool(cs) and lr_h != cs
            if crop and self.split == "train":
                r1 = int(rng.integers(0, lr_h - cs + 1))
                c1 = int(rng.integers(0, lr_w - cs + 1))
            else:
                r1 = c1 = 0
            cs_eff = cs if crop else lr_h
            t = (int(rng.integers(0, 8))
                 if self.augment and self.split == "train" else 0)

            from fbanet_tpu.data import native_io

            # native pass needs a square in-bounds window (crop windows are
            # square; full-frame passthrough needs square frames)
            native_ok = (self.channels == 3
                         and r1 + cs_eff <= lr_h and c1 + cs_eff <= lr_w
                         and (crop or lr_h == lr_w)
                         and native_io.available())
            if self.wire_dtype == "storage":
                # gather/crop/flip the storage integers directly — no
                # normalize multiply at all; the device does it in-step
                lr = lr_all[frame_ids]
                hr = hr_st
                if crop:
                    lr = lr[:, r1:r1 + cs, c1:c1 + cs]
                    if hr is not None:
                        s = hr.shape[0] // lr_h
                        hr = hr[s * r1:s * (r1 + cs), s * c1:s * (c1 + cs)]
                if t:
                    lr = dihedral_transform(lr, t)
                    if hr is not None:
                        hr = dihedral_transform(hr, t)
            elif native_ok:
                lr = native_io.transform_f32(lr_all, frame_ids, r1, c1,
                                             cs_eff, t)
                hr = None
                if hr_st is not None:
                    s = hr_st.shape[0] // lr_h
                    hr = native_io.transform_f32(
                        hr_st[None], [0], s * r1, s * c1, s * cs_eff, t)[0]
            else:  # python fallback (RAW u16, non-square, or no native lib)
                lr = self._storage_to_f32(lr_all[frame_ids])
                hr = (self._storage_to_f32(hr_st)
                      if hr_st is not None else None)
                if crop:
                    lr = lr[:, r1:r1 + cs, c1:c1 + cs]
                    if hr is not None:
                        s = hr.shape[0] // lr_h
                        hr = hr[s * r1:s * (r1 + cs), s * c1:s * (c1 + cs)]
                if t:
                    lr = dihedral_transform(lr, t)
                    if hr is not None:
                        hr = dihedral_transform(hr, t)
        else:
            lr, hr = self._decode_burst([rec.lr_paths[i] for i in frame_ids],
                                        rec.hr_path)

            cs = self.crop_size
            if cs and lr.shape[1] != cs:
                if self.split == "train":
                    r1 = int(rng.integers(0, lr.shape[1] - cs + 1))
                    c1 = int(rng.integers(0, lr.shape[2] - cs + 1))
                else:  # deterministic top-left, like the validation dataset
                    r1 = c1 = 0
                lr_h = lr.shape[1]
                lr = lr[:, r1:r1 + cs, c1:c1 + cs]
                if hr is not None:
                    s = hr.shape[0] // lr_h
                    hr = hr[s * r1:s * (r1 + cs), s * c1:s * (c1 + cs)]

            if self.augment and self.split == "train":
                t = int(rng.integers(0, 8))  # random.getrandbits(3) equivalent
                lr = dihedral_transform(lr, t)
                if hr is not None:
                    hr = dihedral_transform(hr, t)

            if self.wire_dtype == "storage":
                # uncached decode is f32; re-quantize exactly (every value is
                # k/scale and crop/flip do not interpolate)
                scale = 16383.0 if self.channels == 4 else 255.0
                idt = np.uint16 if self.channels == 4 else np.uint8
                lr = np.asarray(np.rint(lr * scale), idt)
                if hr is not None:
                    hr = np.asarray(np.rint(hr * scale), idt)

        out: dict[str, np.ndarray | str] = {"LR": lr, "burst_name": rec.name}
        if hr is not None:
            out["HR"] = hr
        return out
