"""ctypes bridge to the native host-side data-path library.

The compute path is JAX/XLA on TPU; this wraps ``native/gssdf_native.cpp``
(OpenMP C++ — the TPU-native equivalent of the reference's C++/OpenMP data
layer, base_parser.cpp:829-945). Builds on first use via the Makefile;
callers fall back to numpy when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgssdf_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.depth_to_rays.argtypes = [
        _f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        _f32p, _f32p, _f32p,
    ]
    lib.points_to_rays.argtypes = [
        _f32p, ctypes.c_int64, _f32p, _f32p, _f32p,
    ]
    lib.voxel_downsample.argtypes = [
        _f32p, ctypes.c_int64, ctypes.c_float, _f32p, ctypes.c_int64,
    ]
    lib.voxel_downsample.restype = ctypes.c_int64
    lib.occupancy_from_points.argtypes = [
        _f32p, ctypes.c_int64, _f32p, ctypes.c_float, ctypes.c_int, _u32p,
    ]
    lib.native_num_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def depth_to_rays(
    depth: np.ndarray, fx: float, fy: float, cx: float, cy: float,
    rot_c2w: np.ndarray,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(depth.reshape(depth.shape[0], -1), np.float32)
    h, w = d.shape
    rot = np.ascontiguousarray(rot_c2w, np.float32).reshape(9)
    dist = np.empty(h * w, np.float32)
    dirs = np.empty(h * w * 3, np.float32)
    lib.depth_to_rays(d.reshape(-1), h, w, fx, fy, cx, cy, rot, dist, dirs)
    return dist[:, None], dirs.reshape(-1, 3)


def points_to_rays(
    pts: np.ndarray, rot_s2w: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, np.float32)
    n = p.shape[0]
    rot = np.ascontiguousarray(rot_s2w, np.float32).reshape(9)
    dist = np.empty(n, np.float32)
    dirs = np.empty(n * 3, np.float32)
    lib.points_to_rays(p, n, rot, dist, dirs)
    return dist[:, None], dirs.reshape(-1, 3)


def voxel_downsample(pts: np.ndarray, voxel: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, np.float32)
    out = np.empty_like(p)
    m = lib.voxel_downsample(p, p.shape[0], voxel, out, p.shape[0])
    return out[:m].copy()


def occupancy_from_points(
    pts: np.ndarray, origin: np.ndarray, map_size: float, res: int
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, np.float32)
    o = np.ascontiguousarray(origin, np.float32).reshape(3)
    zw = (res + 31) // 32
    grid = np.zeros(res * res * zw, np.uint32)
    lib.occupancy_from_points(p, p.shape[0], o, map_size, res, grid)
    return grid.reshape(res, res, zw)
