"""ctypes bindings for the native burst-IO core (native/burstio.cc).

The native library is the TPU-era replacement for DALI's C++ decode executor
(SURVEY.md §2.4 N5/N6): a persistent std::thread pool decoding PNG files with
libpng directly into contiguous burst buffers, entirely outside the GIL. The
Python loader (`fbanet_tpu.data.loader.BurstLoader`) uses it transparently
when available and falls back to cv2/PIL otherwise.

The shared library is built on demand with `make -C native` (g++ + system
libpng); `ensure_built()` does this automatically on first use.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libburstio.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_pool: ctypes.c_void_p | None = None
_unavailable_reason: str | None = None


def ensure_built() -> bool:
    """Build (if needed) and load the native library. Returns availability."""
    global _lib, _unavailable_reason
    with _lock:
        if _lib is not None:
            return True
        if _unavailable_reason is not None:
            return False
        try:
            if not _LIB_PATH.exists():
                subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.burstio_version.restype = ctypes.c_int
            lib.burstio_pool_create.restype = ctypes.c_void_p
            lib.burstio_pool_create.argtypes = [ctypes.c_int]
            lib.burstio_pool_destroy.argtypes = [ctypes.c_void_p]
            lib.burstio_decode_files.restype = ctypes.c_int
            lib.burstio_decode_files.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.burstio_decode_files_f32.restype = ctypes.c_int
            lib.burstio_decode_files_f32.argtypes = (
                lib.burstio_decode_files.argtypes)
            lib.burstio_transform_f32.restype = ctypes.c_int
            lib.burstio_transform_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            assert lib.burstio_version() >= 11
            _lib = lib
            return True
        except Exception as exc:  # missing toolchain/libpng -> fall back
            _unavailable_reason = f"{type(exc).__name__}: {exc}"
            return False


def available() -> bool:
    return ensure_built()


def unavailable_reason() -> str | None:
    return _unavailable_reason


def _get_pool(threads: int = 16) -> ctypes.c_void_p:
    global _pool
    if _pool is None:
        _pool = ctypes.c_void_p(_lib.burstio_pool_create(threads))
    return _pool


def decode_files(paths: list[str | Path], height: int, width: int,
                 *, channels: int = 3, as_float: bool = True) -> np.ndarray:
    """Decode `paths` in parallel into one [N, H, W, C] array.

    All images must be (height, width); raises on mismatch or corrupt files.
    `as_float` fuses the /255 normalization (f32 in [0,1]); otherwise uint8.
    """
    if not ensure_built():
        raise RuntimeError(f"native burstio unavailable: {_unavailable_reason}")
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    pool = _get_pool()
    if as_float:
        out = np.empty((n, height, width, channels), np.float32)
        rc = _lib.burstio_decode_files_f32(
            pool, n, c_paths, out.ctypes.data_as(ctypes.c_void_p),
            height, width, channels)
    else:
        out = np.empty((n, height, width, channels), np.uint8)
        rc = _lib.burstio_decode_files(
            pool, n, c_paths, out.ctypes.data_as(ctypes.c_void_p),
            height, width, channels)
    if rc != 0:
        idx, code = divmod(rc, 100)
        raise OSError(f"burstio decode failed (file #{idx}, code {code}): "
                      f"{paths[min(idx, n - 1)]}")
    return out


def transform_f32(src: np.ndarray, sel: list[int], r0: int, c0: int, cs: int,
                  dihedral: int) -> np.ndarray:
    """Gather+crop+dihedral+/255 from a decoded uint8 cache in one native pass.

    src: [N, H, W, C] uint8 (C-contiguous); returns [len(sel), cs, cs, C]
    float32 in [0, 1] — crop window at (r0, c0), then the dihedral transform
    numbered like `fbanet_tpu.data.realbsr.dihedral_transform`. This is the
    loader's sample-assembly fast path (the reference dataset's
    crop+augment+normalize, fba_net/ManualDataset.py.bak:125-148, off the
    GIL)."""
    if not ensure_built():
        raise RuntimeError(f"native burstio unavailable: {_unavailable_reason}")
    assert src.dtype == np.uint8 and src.ndim == 4 and src.flags.c_contiguous
    n_src, h, w, c = src.shape
    n_sel = len(sel)
    c_sel = (ctypes.c_int * n_sel)(*[int(s) for s in sel])
    out = np.empty((n_sel, cs, cs, c), np.float32)
    rc = _lib.burstio_transform_f32(
        _get_pool(), src.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), c_sel, n_sel, n_src, h, w, c,
        r0, c0, cs, dihedral)
    if rc != 0:
        raise OSError(f"burstio transform failed (code {rc}): "
                      f"crop ({r0},{c0})+{cs} of {src.shape}, t={dihedral}")
    return out
