"""ctypes bindings for the native (C++) image-preprocessing library.

`native/preprocess.cpp` does resize/center-crop/flip/normalize/batch-assembly
in multithreaded C++ — the host-side hot path that feeds the TPU. The library
is compiled on first use (g++, ~1 s) and cached next to the source; if the
toolchain is unavailable everything falls back to the PIL path in
`utils/data.py` transparently.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"
_LIB_PATH = _NATIVE_DIR / "libdmt_preproc.so"
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["sh", str(_NATIVE_DIR / "build.sh")],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.dmt_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),          # images
            ctypes.POINTER(ctypes.c_int),             # dims
            ctypes.c_int,                             # n
            ctypes.c_int,                             # target
            ctypes.POINTER(ctypes.c_uint8),           # flips
            ctypes.POINTER(ctypes.c_float),           # out
            ctypes.c_int,                             # num_threads
        ]
        lib.dmt_preprocess_batch.restype = None
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_batch(
    raw_images: Sequence[np.ndarray],
    target: int,
    flips: Optional[Sequence[bool]] = None,
    num_threads: int = 4,
) -> np.ndarray:
    """raw_images: list of HWC uint8 arrays (any sizes, same channel count)
    → (N, target, target, C) float32 [0,1] batch."""
    lib = _load()
    assert lib is not None, "native preprocessing library unavailable"

    n = len(raw_images)
    ch = raw_images[0].shape[2]
    raws = [np.ascontiguousarray(img, dtype=np.uint8) for img in raw_images]

    ptrs = (ctypes.c_void_p * n)(
        *(r.ctypes.data_as(ctypes.c_void_p).value for r in raws)
    )
    dims = np.empty((n, 3), np.int32)
    for i, r in enumerate(raws):
        assert r.shape[2] == ch, "mixed channel counts in batch"
        dims[i] = r.shape
    flips_arr = np.asarray(
        flips if flips is not None else np.zeros(n), dtype=np.uint8
    )
    out = np.empty((n, target, target, ch), np.float32)

    lib.dmt_preprocess_batch(
        ptrs,
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        target,
        flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return out
