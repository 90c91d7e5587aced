"""ctypes bindings for the native IO runtime (libmit_native.so).

Build once with ``python -m mri_interpolation_tpu.native.build`` (or call
:func:`build`). All entry points degrade gracefully: when the library is
missing, ``available()`` is False and callers (io.volume) fall back to the
pure-NumPy implementations, which also serve as the correctness oracle in
tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "build", "load_volume_native", "save_volume_native", "make_coords_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmit_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile libmit_native.so with g++ (-O3, linked against zlib)."""
    src = os.path.join(_DIR, "nifti_codec.cc")
    if force or not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", _LIB_PATH, "-lz"],
            check=True,
            capture_output=True,
        )
    global _lib
    _lib = None  # force reload
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mit_nifti_probe.restype = ctypes.c_int64
    lib.mit_nifti_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mit_nifti_decode.restype = ctypes.c_int
    lib.mit_nifti_decode.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
    lib.mit_nifti_encode.restype = ctypes.c_int
    lib.mit_nifti_encode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mit_minmax_normalize.restype = None
    lib.mit_minmax_normalize.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int]
    lib.mit_make_coords.restype = None
    lib.mit_make_coords.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_volume_native(path: str, zero_centered: bool = False) -> Tuple[np.ndarray, Tuple[int, ...], Tuple[float, ...]]:
    """Decode + normalize a NIfTI volume natively.

    Returns (normalized C-order float32 array, shape, pixdim). Raises on
    decode failure so callers can fall back.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run mri_interpolation_tpu.native.build()")
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int()
    pixdim = (ctypes.c_float * 8)()
    n = lib.mit_nifti_probe(path.encode(), shape, ctypes.byref(ndim), pixdim)
    if n < 0:
        raise ValueError(f"native probe failed for {path}")
    out = np.empty(n, dtype=np.float32)
    rc = lib.mit_nifti_decode(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"native decode failed (code {rc}) for {path}")
    lib.mit_minmax_normalize(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, int(zero_centered))
    shp = tuple(int(shape[i]) for i in range(ndim.value))
    pd = tuple(float(pixdim[i]) for i in range(ndim.value))
    return out.reshape(shp), shp, pd


def save_volume_native(path: str, data: np.ndarray, pixdim: Optional[Tuple[float, ...]] = None) -> None:
    """Encode a C-ordered array as gzipped float32 NIfTI-1 (the write half of
    the native IO runtime; identity orientation, vox_offset 352)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run mri_interpolation_tpu.native.build()")
    arr = np.ascontiguousarray(data, dtype=np.float32)
    d = arr.ndim
    shape = (ctypes.c_int64 * d)(*arr.shape)
    pd_vals = tuple(pixdim) if pixdim else tuple(1.0 for _ in range(d))
    pd = (ctypes.c_float * d)(*(list(pd_vals) + [1.0] * d)[:d])
    rc = lib.mit_nifti_encode(path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                              shape, d, pd)
    if rc != 0:
        raise ValueError(f"native encode failed (code {rc}) for {path}")


def make_coords_native(shape, lo: float = 0.0, hi: float = 1.0) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built")
    shape = tuple(int(s) for s in shape)
    d = len(shape)
    n = int(np.prod(shape))
    out = np.empty((n, d), dtype=np.float32)
    arr = (ctypes.c_int64 * d)(*shape)
    lib.mit_make_coords(arr, d, lo, hi, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
