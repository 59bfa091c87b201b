"""ctypes binding for the native (C++) reconstruction core (csrc/).

Builds libreconstruct.so on first use (g++ -O3) and caches it next to the
source; every entry point has a pure-Python fallback in chem/reconstruct.py
and geom/voxel.py, so the native path is an accelerator, not a dependency.
Used by the evaluation sweeps where bond perception runs over 10k+ generated
molecules (the reference leans on OpenBabel's C++ for the same step)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_CSRC, "reconstruct.cpp")
    so = os.path.join(_CSRC, "libreconstruct.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.connect_the_dots_native.restype = ctypes.c_int
        lib.connect_the_dots_native.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int)]
        lib.count_voxels_native.restype = ctypes.c_int
        lib.count_voxels_native.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_double, ctypes.c_double]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def connect_the_dots_native(pos: np.ndarray, rc: np.ndarray,
                            maxb: np.ndarray, covalent_factor: float = 1.3
                            ) -> Optional[List[Tuple[int, int]]]:
    """Native geometric bond perception; None when the library is missing."""
    lib = _build_and_load()
    if lib is None:
        return None
    n = len(rc)
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    rc = np.ascontiguousarray(rc, dtype=np.float64)
    maxb = np.ascontiguousarray(maxb, dtype=np.int32)
    out = np.zeros((n * max(n, 1), 2), dtype=np.int32)
    cnt = lib.connect_the_dots_native(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        maxb.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n, float(covalent_factor),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return [(int(i), int(j)) for i, j in out[:cnt]]


def count_voxels_native(pos: np.ndarray, radii: np.ndarray,
                        grid_resolution: float = 0.5,
                        max_dist: float = 11.0) -> Optional[int]:
    lib = _build_and_load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    radii = np.ascontiguousarray(radii, dtype=np.float64)
    return int(lib.count_voxels_native(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        radii.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(radii), float(grid_resolution), float(max_dist)))


# ---------------------------------------------------------------------------
# surface extraction (csrc/surface.cpp)
# ---------------------------------------------------------------------------

_SURF_LIB = None
_SURF_TRIED = False


def _build_and_load_surface() -> Optional[ctypes.CDLL]:
    global _SURF_LIB, _SURF_TRIED
    if _SURF_LIB is not None or _SURF_TRIED:
        return _SURF_LIB
    _SURF_TRIED = True
    src = os.path.join(_CSRC, "surface.cpp")
    so = os.path.join(_CSRC, "libsurface.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                           check=True, capture_output=True, timeout=180)
        lib = ctypes.CDLL(so)
        lib.surface_mesh.restype = ctypes.c_int
        lib.surface_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        _SURF_LIB = lib
    except Exception:
        _SURF_LIB = None
    return _SURF_LIB


def surface_mesh_native(pos: np.ndarray, radii_inflated: np.ndarray,
                        spacing: float = 0.5, padding: float = 4.0
                        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native marching-tetrahedra isosurface of the probe-inflated vdW
    field. radii_inflated = r_vdw + probe. Returns (verts, faces) or None
    when the library is unavailable."""
    lib = _build_and_load_surface()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    radii = np.ascontiguousarray(radii_inflated, dtype=np.float64)
    max_v, max_f = 200_000, 400_000
    for _ in range(3):
        verts = np.empty((max_v, 3), dtype=np.float64)
        faces = np.empty((max_f, 3), dtype=np.int32)
        n_v = ctypes.c_int(0)
        n_f = ctypes.c_int(0)
        rc = lib.surface_mesh(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            radii.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(radii), float(spacing), float(padding),
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            max_v, max_f, ctypes.byref(n_v), ctypes.byref(n_f))
        if rc == 0:
            return verts[:n_v.value].copy(), faces[:n_f.value].astype(
                np.int64)
        if rc == 1:                       # buffers too small — grow
            max_v, max_f = max_v * 4, max_f * 4
            continue
        return None
    return None
