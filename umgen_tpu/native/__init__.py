"""Native (C++) host-side kernels, loaded via ctypes.

Build on demand with ``umgen_tpu.native.build()`` or ``make -C
umgen_tpu/native`` — the shared object lands next to the sources.  Python
fallbacks exist for every native entry point, so the framework works
without a compiler; the natives make host-side metrics O(10x) faster on
large scenes (the role numba played in the reference,
ref:plugin/misc/misc.py:181).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libumgen_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the extension with g++ (no external deps)."""
    if os.path.exists(_SO) and not force:
        return _SO
    src = os.path.join(_HERE, "collision.cc")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-march=native",
           "-o", _SO, src]
    subprocess.run(cmd, check=True)
    return _SO


def load(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        if not auto_build:
            return None
        try:
            build()
        except Exception:
            return None
    lib = ctypes.CDLL(_SO)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.umgen_bev_corners.argtypes = [f32p, ctypes.c_int64, f32p]
    lib.umgen_box_collision.argtypes = [f32p, ctypes.c_int64, f32p,
                                        ctypes.c_int64, u8p]
    lib.umgen_collision_matrix.argtypes = [f32p, ctypes.c_int64, u8p]
    _lib = lib
    return lib


def available() -> bool:
    return load(auto_build=True) is not None


def collision_matrix(boxes10: np.ndarray) -> np.ndarray:
    """(N, 10) metric boxes → (N, N) bool, native if available, else the
    numpy implementation in umgen_tpu.ops.collision."""
    boxes10 = np.ascontiguousarray(boxes10, dtype=np.float32)
    n = boxes10.shape[0]
    lib = load()
    if lib is None or n == 0:
        from umgen_tpu.ops.collision import collision_matrix_np
        return collision_matrix_np(boxes10)
    out = np.zeros((n, n), dtype=np.uint8)
    lib.umgen_collision_matrix(boxes10, n, out)
    return out.astype(bool)
