"""Native C++ runtime bindings (ctypes).

Builds libphysim_runtime.so on first use (g++, cached next to the source) and
exposes the fast paths: PLY/OBJ mesh loading and the O(N^2) PPF table build.
Every entry point has a pure-Python fallback (models/assets.py, ops/ppf.py),
so the framework functions without a compiler; the native path is preferred
when available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "physim_runtime.cc")
_LIB = os.path.join(_HERE, "libphysim_runtime.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


class _MeshOut(ctypes.Structure):
    _fields_ = [
        ("vertices", ctypes.POINTER(ctypes.c_float)),
        ("faces", ctypes.POINTER(ctypes.c_int32)),
        ("n_vertices", ctypes.c_int64),
        ("n_faces", ctypes.c_int64),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.physim_load_ply.argtypes = [ctypes.c_char_p, ctypes.POINTER(_MeshOut)]
        lib.physim_load_ply.restype = ctypes.c_int
        lib.physim_load_obj.argtypes = [ctypes.c_char_p, ctypes.POINTER(_MeshOut)]
        lib.physim_load_obj.restype = ctypes.c_int
        lib.physim_free.argtypes = [ctypes.c_void_p]
        lib.physim_build_ppf.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.physim_build_ppf.restype = ctypes.c_int
        _lib = lib
        return _lib


def load_mesh_native(path: str):
    """Load a PLY/OBJ mesh natively. Returns (vertices, faces) or None."""
    lib = get_lib()
    if lib is None:
        return None
    out = _MeshOut()
    fn = lib.physim_load_obj if path.endswith(".obj") else lib.physim_load_ply
    rc = fn(path.encode(), ctypes.byref(out))
    if rc != 0 or out.n_vertices == 0:
        if out.vertices:
            lib.physim_free(out.vertices)
        if out.faces:
            lib.physim_free(out.faces)
        return None
    verts = np.ctypeslib.as_array(out.vertices, shape=(out.n_vertices, 3)).copy()
    if out.n_faces:
        faces = np.ctypeslib.as_array(out.faces, shape=(out.n_faces, 3)).copy()
    else:
        faces = np.zeros((0, 3), np.int32)
    lib.physim_free(out.vertices)
    lib.physim_free(out.faces)
    return verts.astype(np.float32), faces.astype(np.int32)


def build_ppf_native(
    pts: np.ndarray, nrm: np.ndarray, trans_disc: int, rot_disc: int, max_dist_mm: int
):
    """Native CSR PPF build. Returns (offsets, counts, pairs) or None."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    nrm = np.ascontiguousarray(nrm, np.float32)
    offsets_p = ctypes.POINTER(ctypes.c_int32)()
    counts_p = ctypes.POINTER(ctypes.c_int32)()
    pairs_p = ctypes.POINTER(ctypes.c_int32)()
    n_bins = ctypes.c_int64()
    total = ctypes.c_int64()
    rc = lib.physim_build_ppf(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pts), trans_disc, rot_disc, max_dist_mm,
        ctypes.byref(offsets_p), ctypes.byref(counts_p), ctypes.byref(pairs_p),
        ctypes.byref(n_bins), ctypes.byref(total),
    )
    if rc != 0:
        return None
    nb, tot = n_bins.value, total.value
    offsets = np.ctypeslib.as_array(offsets_p, shape=(nb,)).copy()
    counts = np.ctypeslib.as_array(counts_p, shape=(nb,)).copy()
    pairs = np.ctypeslib.as_array(pairs_p, shape=(max(tot, 1), 2))[:tot].copy()
    lib.physim_free(offsets_p)
    lib.physim_free(counts_p)
    lib.physim_free(pairs_p)
    return offsets, counts, pairs
