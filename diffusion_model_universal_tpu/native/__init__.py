"""ctypes bindings for the native host-side data path (batch_loader.cpp).

Build on demand (g++ -O3 -shared); all entry points degrade gracefully to
NumPy when the toolchain or the built library is unavailable, so the
framework never hard-depends on native code being compiled.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "batch_loader.cpp"
_LIB = _DIR / "libdmu_loader.so"

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    global _build_failed
    if _LIB.exists() and not force:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-std=c++17", str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        _build_failed = False
        return True
    except Exception:
        _build_failed = True
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB.exists() and not build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.dmu_shuffle.argtypes = [i64p, ctypes.c_int64, ctypes.c_uint64]
    lib.dmu_gather_batch.argtypes = [u8p, i64p, u8p, u8p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int]
    lib.dmu_center_crop_resize.argtypes = [u8p, u8p, ctypes.c_int64,
                                           ctypes.c_int64, ctypes.c_int64,
                                           ctypes.c_int64, ctypes.c_int64,
                                           ctypes.c_int64, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    """Deterministic epoch permutation (SplitMix64 Fisher-Yates)."""
    lib = _load()
    out = np.empty(n, np.int64)
    if lib is None:
        return np.random.default_rng(seed).permutation(n).astype(np.int64)
    lib.dmu_shuffle(_i64(out), n, ctypes.c_uint64(seed & (2 ** 64 - 1)))
    return out


# Below this gather size, numpy fancy indexing beats the threaded gather
# (thread-dispatch overhead; measured crossover ≈ 30-70 MB on this host:
# 25 MB → numpy 0.75× faster, 73 MB → native 1.74× faster).
_GATHER_NATIVE_MIN_BYTES = 32 * 1024 * 1024


def gather_batch(data: np.ndarray, indices: np.ndarray,
                 flip: Optional[np.ndarray] = None,
                 out: Optional[np.ndarray] = None,
                 num_threads: int = 8) -> np.ndarray:
    """Gather of ``data[indices]`` (uint8 NHWC), optional per-sample
    horizontal flip, into ``out`` (allocated if None). Uses the threaded
    C++ path for large gathers and numpy below the crossover size."""
    lib = _load()
    b = len(indices)
    _, h, w, c = data.shape
    if out is None:
        out = np.empty((b, h, w, c), np.uint8)
    if lib is None or b * h * w * c < _GATHER_NATIVE_MIN_BYTES:
        batch = data[indices]
        if flip is not None:
            batch = np.where(flip[:, None, None, None] != 0,
                             batch[:, :, ::-1, :], batch)
        out[...] = batch
        return out
    idx = np.ascontiguousarray(indices, np.int64)
    flip_ptr = _u8(np.ascontiguousarray(flip, np.uint8)) if flip is not None \
        else ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    lib.dmu_gather_batch(_u8(np.ascontiguousarray(data)), _i64(idx),
                         flip_ptr, _u8(out), b, h, w, c, num_threads)
    return out


def center_crop_resize(data: np.ndarray, crop: int, out_size: int,
                       num_threads: int = 8) -> np.ndarray:
    """Threaded uint8 center-crop + bilinear resize (the CelebA 178→64
    path). Falls back to jax.image on CPU when the lib is unavailable."""
    lib = _load()
    n, h, w, c = data.shape
    if lib is None:
        from ..datasets.pipeline import host_center_crop, host_resize
        return host_resize(host_center_crop(data, crop), out_size)
    out = np.empty((n, out_size, out_size, c), np.uint8)
    lib.dmu_center_crop_resize(_u8(np.ascontiguousarray(data)), _u8(out), n,
                               h, w, c, crop, out_size, num_threads)
    return out
