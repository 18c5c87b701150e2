"""Native (C++) runtime components, loaded via ctypes with auto-build.

The reference's native code is CUDA/C++ (curope kernels, pycolmap/Ceres
BA); our TPU compute path replaces those with Pallas/XLA, and this package
holds the native HOST-side pieces: currently the covisibility random-walk
sampler used by the data loader (the hot Python path of
``base_dataset.py:316-454``).

Build is lazy: on first import we compile ``covis_sampler.cpp`` with g++
if the shared library is missing or stale; failures fall back to the numpy
implementation transparently.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "covis_sampler.cpp"
_LIB = _DIR / "libcovis_sampler.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.covis_random_walk.restype = ctypes.c_int
        lib.covis_random_walk.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # covis
            ctypes.c_int,  # n
            ctypes.c_float,  # thres
            ctypes.c_int,  # num_samples
            ctypes.c_int,  # max_retries
            ctypes.c_int,  # bidirectional
            ctypes.c_uint64,  # seed
            ctypes.POINTER(ctypes.c_int),  # out
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def covis_random_walk_native(
    covis: np.ndarray,
    thres: float,
    num_samples: int,
    seed: int,
    max_retries: int = 4,
    bidirectional: bool = True,
) -> Optional[np.ndarray]:
    """Native random-walk sampling; None if the library is unavailable.

    ``covis`` is materialized to contiguous float32 (mmap rows are read
    once by the C++ walk).
    """
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(covis, dtype=np.float32)
    n = c.shape[0]
    out = np.zeros(num_samples, dtype=np.int32)
    count = lib.covis_random_walk(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.c_float(thres),
        num_samples,
        max_retries,
        1 if bidirectional else 0,
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out[:count]
