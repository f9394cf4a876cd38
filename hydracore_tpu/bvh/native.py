"""ctypes bridge to the native C++ SAH builder (bvh/cpp/bvh_builder.cpp).

Compiled on first use with g++ -O2 (cached as .so next to the source);
falls back to the numpy builder when no compiler is available. The output
ABI is identical to builder.FlatBVH so scene assembly is builder-agnostic.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from hydracore_tpu.bvh.builder import FlatBVH

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "cpp", "bvh_builder.cpp")
_SO = os.path.join(_DIR, "cpp", "libbvh_builder.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O2", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(_SO)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.hydra_build_bvh.argtypes = [f32p, f32p, f32p, ctypes.c_int32,
                                    f32p, f32p, i32p, i32p, i32p, i32p]
    lib.hydra_build_bvh.restype = ctypes.c_int32
    lib.hydra_build_bvh_ps.argtypes = [
        f32p, f32p, f32p, ctypes.c_int32, u8p, ctypes.c_int32,
        f32p, f32p, i32p, i32p, i32p, i32p,
        ctypes.POINTER(ctypes.c_int32)]
    lib.hydra_build_bvh_ps.restype = ctypes.c_int32
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def build_bvh_native(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                     splittable: np.ndarray | None = None,
                     presplit: bool | None = None) -> FlatBVH:
    """presplit=True splits references of large/thin triangles before the
    SAH build (early_split.h SubdivMetric semantics; the reference ships the
    metric but its split loop is vestigial and off by default — ours is
    real, opt-in via HYDRA_PRESPLIT=1). The returned FlatBVH.perm then maps
    ref -> source tri id and MAY CONTAIN DUPLICATES; scene assembly gathers
    per-tri attributes through it, which every traversal consumer tolerates.
    `splittable` (bool, len T) masks triangles that must stay
    single-reference (mesh-light emitters: their area CDFs count rows)."""
    lib = _load()
    T = v0.shape[0]
    if T == 0:
        z = np.zeros((1, 3), np.float32)
        return FlatBVH(z, z, np.array([0], np.int32), np.array([-1], np.int32),
                       np.array([0], np.int32), np.zeros(0, np.int32))
    if presplit is None:
        presplit = os.environ.get("HYDRA_PRESPLIT", "0") == "1"
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    if presplit:
        max_refs = 2 * T  # the reference budget: at most 1 extra ref per tri
        cap = 2 * max_refs
        bmin = np.empty((cap, 3), np.float32)
        bmax = np.empty((cap, 3), np.float32)
        left = np.empty(cap, np.int32)
        right = np.empty(cap, np.int32)
        count = np.empty(cap, np.int32)
        perm = np.empty(max_refs, np.int32)
        if splittable is None:
            splittable = np.ones(T, np.uint8)
        else:
            splittable = np.ascontiguousarray(
                np.asarray(splittable).astype(np.uint8))
        nrefs = ctypes.c_int32(0)
        n = _lib.hydra_build_bvh_ps(v0, v1, v2, T, splittable, max_refs,
                                    bmin, bmax, left, right, count, perm,
                                    ctypes.byref(nrefs))
        return FlatBVH(bmin[:n].copy(), bmax[:n].copy(), left[:n].copy(),
                       right[:n].copy(), count[:n].copy(),
                       perm[:nrefs.value].copy())
    cap = 2 * T
    bmin = np.empty((cap, 3), np.float32)
    bmax = np.empty((cap, 3), np.float32)
    left = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    perm = np.empty(T, np.int32)
    n = lib.hydra_build_bvh(v0, v1, v2, T, bmin, bmax, left, right, count, perm)
    return FlatBVH(bmin[:n].copy(), bmax[:n].copy(), left[:n].copy(),
                   right[:n].copy(), count[:n].copy(), perm)


def build_bvh_auto(v0, v1, v2, splittable=None, presplit=None) -> FlatBVH:
    """Native builder when compilable, numpy otherwise (pre-split is a
    native-only feature; the numpy fallback ignores it)."""
    if native_available():
        return build_bvh_native(v0, v1, v2, splittable, presplit)
    from hydracore_tpu.bvh.builder import build_bvh

    return build_bvh(v0, v1, v2)
