"""ctypes bindings for the C++ host runtime (auto-builds on first use)."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        from nbody_tpu.native.build import build

        lib = ctypes.CDLL(build())
    except Exception:
        _LIB = None
        return None

    lib.nbt_msvc_rand_fill.argtypes = [
        ctypes.c_uint32, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
    ]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.nbt_disk_galaxy_ic.argtypes = [
        ctypes.c_uint32, ctypes.c_int64, ctypes.c_float,
        f32p, f32p, f32p, f32p, f32p, f32p, f32p,
    ]
    lib.nbt_write_dump.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.nbt_write_dump.restype = ctypes.c_int
    lib.nbt_load_dump.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.nbt_load_dump.restype = ctypes.c_int64
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def msvc_rand(seed: int, count: int) -> np.ndarray:
    lib = _load()
    out = np.empty(count, np.uint16)
    lib.nbt_msvc_rand_fill(seed & 0xFFFFFFFF, count, out)
    return out


def disk_galaxy_ic(seed: int, n: int, g: float):
    lib = _load()
    arrs = [np.empty(n, np.float32) for _ in range(7)]
    lib.nbt_disk_galaxy_ic(seed & 0xFFFFFFFF, n, g, *arrs)
    px, py, pz, vx, vy, vz, mass = arrs
    pos = np.stack([px, py, pz], axis=1)
    vel = np.stack([vx, vy, vz], axis=1)
    return pos, vel, mass


def write_dump(path: str, header: str, data: np.ndarray) -> None:
    lib = _load()
    data = np.ascontiguousarray(data, np.float64)
    rc = lib.nbt_write_dump(path.encode(), header.encode(), data,
                            data.shape[0], data.shape[1])
    if rc != 0:
        raise IOError(f"nbt_write_dump failed for {path}")


def load_dump(path: str, max_rows: int, cols: int) -> np.ndarray:
    lib = _load()
    out = np.empty((max_rows, cols), np.float64)
    n = lib.nbt_load_dump(path.encode(), out, max_rows, cols)
    if n < 0:
        raise IOError(f"nbt_load_dump failed for {path}")
    return out[:n]
