"""Triangle BVH: ctypes binding to the native C++ library.

Host-side equivalent of the reference TriangleBvh
(src/triangle_bvh.cu:433+ build; :147-330 queries). Used for SDF
ground-truth labels (signed_distance in Watertight/Raystab modes —
testbed_sdf.cu:1186-1274), GT ray-traced rendering, and the IoU metric.

The native library auto-builds on first import (g++, ~1 s) and is cached
next to the sources. PathEscape mode (OptiX-only upstream) is approximated
by Raystab, which the reference itself falls back to without OptiX.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libingp_native.so")

_lib = None


def _load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "triangle_bvh.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.bvh_build.restype = ctypes.c_void_p
    lib.bvh_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                              ctypes.c_int]
    lib.bvh_free.argtypes = [ctypes.c_void_p]
    lib.bvh_n_nodes.argtypes = [ctypes.c_void_p]
    lib.bvh_n_nodes.restype = ctypes.c_int
    lib.bvh_signed_distance.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.c_float]
    lib.bvh_ray_trace.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)]
    lib.bvh_closest_point.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


_SDF_MODES = {"Watertight": 0, "Raystab": 1, "PathEscape": 1, "Unsigned": 2}


class TriangleBvh:
    """BVH over a triangle soup (n, 3, 3) float32."""

    def __init__(self, triangles: np.ndarray, leaf_size: int = 4):
        self.triangles = np.ascontiguousarray(triangles, np.float32) \
            .reshape(-1, 3, 3)
        self._lib = _load_library()
        self._handle = self._lib.bvh_build(
            _fptr(self.triangles), len(self.triangles), leaf_size)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.bvh_free(self._handle)
            self._handle = None

    @property
    def n_nodes(self) -> int:
        return self._lib.bvh_n_nodes(self._handle)

    def signed_distance(self, positions: np.ndarray,
                        mode: str = "Raystab",
                        rng_offset: Tuple[float, float] = (0.0, 0.0)
                        ) -> np.ndarray:
        """(n, 3) points -> (n,) signed distances (negative inside)."""
        pos = np.ascontiguousarray(positions, np.float32).reshape(-1, 3)
        out = np.empty(len(pos), np.float32)
        self._lib.bvh_signed_distance(
            self._handle, _fptr(pos), len(pos), _fptr(out),
            _SDF_MODES[mode], rng_offset[0], rng_offset[1])
        return out

    def ray_trace(self, origins: np.ndarray, dirs: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (t, tri_idx); t = 10 (MAX_DIST) and idx -1 on miss."""
        o = np.ascontiguousarray(origins, np.float32).reshape(-1, 3)
        d = np.ascontiguousarray(dirs, np.float32).reshape(-1, 3)
        t = np.empty(len(o), np.float32)
        idx = np.empty(len(o), np.int32)
        self._lib.bvh_ray_trace(self._handle, _fptr(o), _fptr(d), len(o),
                                _fptr(t), _iptr(idx))
        return t, idx

    def closest_point(self, positions: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
        pos = np.ascontiguousarray(positions, np.float32).reshape(-1, 3)
        out = np.empty_like(pos)
        idx = np.empty(len(pos), np.int32)
        self._lib.bvh_closest_point(self._handle, _fptr(pos), len(pos),
                                    _fptr(out), _iptr(idx))
        return out, idx

    def triangle_normals(self) -> np.ndarray:
        a, b, c = (self.triangles[:, 0], self.triangles[:, 1],
                   self.triangles[:, 2])
        n = np.cross(b - a, c - a)
        return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True),
                              1e-12)


def load_obj(path: str) -> np.ndarray:
    """Load an OBJ file as a triangle soup (n, 3, 3) float32
    (tinyobj wrapper equivalent, src/tinyobj_loader_wrapper.cu)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) for p in line.split()[1:]]
                # fan-triangulate polygons
                for i in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[i], idx[i + 1]])
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int64)
    f = np.where(f > 0, f - 1, len(v) + f)  # OBJ 1-based / negative indexing
    return v[f]


def normalize_mesh_to_unit_cube(triangles: np.ndarray,
                                inflation: float = 1.0 / 9.0
                                ) -> Tuple[np.ndarray, float, np.ndarray]:
    """Scale+center mesh into the unit cube with the reference's margin
    (load_mesh, testbed_sdf.cu:1099-1184 scales so the mesh occupies the
    central ~(1 - 2*inflation) of [0,1]^3). Returns (tris, scale, offset)
    with world = mesh * scale + offset."""
    lo = triangles.reshape(-1, 3).min(0)
    hi = triangles.reshape(-1, 3).max(0)
    size = float((hi - lo).max())
    scale = (1.0 - 2 * inflation) / size
    center = (hi + lo) * 0.5
    offset = 0.5 - center * scale
    out = triangles * scale + offset
    return out.astype(np.float32), scale, offset.astype(np.float32)
