"""ctypes binding for the native mesh segmentator (superpoint generation).

Offline-prep equivalent of ``segmentator.segment_mesh`` used by the
reference (``/root/reference/data/scannet/batch_load_scannet_data.py:84-89``)
to produce superpoints; the C++ core lives in ``native/segmentator`` and is
built on demand with ``make``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "segmentator")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsegmentator.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        subprocess.check_call(["make", "-C", _NATIVE_DIR])
    _lib = ctypes.CDLL(_LIB_PATH)
    _lib.segment_mesh.restype = ctypes.c_int
    _lib.segment_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    return _lib


def segment_mesh(vertices: np.ndarray, faces: np.ndarray,
                 kthr: float = 0.01, seg_min_verts: int = 20) -> np.ndarray:
    """vertices (N,3) float, faces (M,3) int -> per-vertex segment ids."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    out = np.zeros(v.shape[0], np.int32)
    n_seg = lib.segment_mesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), f.shape[0],
        ctypes.c_float(kthr), seg_min_verts,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    assert n_seg > 0 or v.shape[0] == 0
    return out.astype(np.int64)
