"""Host-side (C++) sparse-conv plan building + numpy fallback.

Production path for kernel maps: the native library
(``native/sparseplan``) builds voxel dedup, neighbor tables and the
downsample pyramid on CPU (hash maps are latency-cheap there), and the
static index arrays ship to the device alongside the batch — overlapped
with TPU compute in the input pipeline.  The on-device hash engine
(``ops.hashing`` / ``ops.voxelize`` / ``build_unet_plan``) remains as the
self-contained fallback (used when ``SceneBatch.host_plan`` is absent).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, NamedTuple, Optional, Sequence

import numpy as np

from segdino3d_tpu.ops.sparse_conv import kernel_offsets

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "sparseplan")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsparseplan.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        subprocess.check_call(["make", "-C", _NATIVE_DIR])
    lib = ctypes.CDLL(_LIB_PATH)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.voxel_dedup.restype = ctypes.c_int64
    lib.voxel_dedup.argtypes = [i32p, u8p, ctypes.c_int64, i32p, i32p,
                                ctypes.c_int64]
    lib.neighbor_table.restype = None
    lib.neighbor_table.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                   i32p, ctypes.c_int32, i32p]
    lib.downsample.restype = ctypes.c_int64
    lib.downsample.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                               i32p, i32p, i32p, ctypes.c_int64]
    _lib = lib
    return lib


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class HostLevel(NamedTuple):
    num_voxels: int
    subm_nbr: np.ndarray            # (27, V) int32
    parent_idx: Optional[np.ndarray]   # (V,) into coarser level
    parent_kpos: Optional[np.ndarray]


class HostPlan(NamedTuple):
    """Numpy plan; ``to_device`` adapts it into the UNetPlan pytree."""
    inverse_mapping: np.ndarray     # (N,) point -> voxel id (-1 invalid)
    levels: List[HostLevel]
    stem_nbr: np.ndarray            # (k^3, V0)
    overflow: bool


def build_host_plan(coords_f: np.ndarray,
                    batch_idx: np.ndarray,
                    valid: np.ndarray,
                    level_caps: Sequence[int],
                    num_levels: int = 5,
                    stem_kernel: int = 5) -> HostPlan:
    """coords_f: (N, 3) float voxel-unit coordinates (min-shifted >= 0)."""
    lib = _load()
    n = coords_f.shape[0]
    ijk = np.maximum(np.floor(coords_f).astype(np.int32), 0)
    coords4 = np.ascontiguousarray(
        np.concatenate([batch_idx.astype(np.int32)[:, None], ijk], axis=1))
    valid_u8 = np.ascontiguousarray(valid.astype(np.uint8))

    inverse = np.empty(n, np.int32)
    v0_cap = int(level_caps[0])
    vox = np.zeros((v0_cap, 4), np.int32)
    cnt = int(lib.voxel_dedup(
        _i32p(coords4), valid_u8.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)), n, _i32p(inverse), _i32p(vox),
        v0_cap))
    overflow = cnt > v0_cap
    cnt = min(cnt, v0_cap)
    inverse[inverse >= v0_cap] = -1

    k3 = np.ascontiguousarray(kernel_offsets(3))
    levels: List[HostLevel] = []
    level_coords = vox
    level_cnt = cnt
    for li in range(num_levels):
        v_cap = level_coords.shape[0]
        nbr = np.empty((27, v_cap), np.int32)
        lib.neighbor_table(_i32p(level_coords), v_cap, level_cnt,
                           _i32p(k3), 27, _i32p(nbr))
        parent = kpos = None
        if li < num_levels - 1:
            c_cap = int(level_caps[li + 1])
            parent = np.empty(v_cap, np.int32)
            kpos = np.empty(v_cap, np.int32)
            coarse = np.zeros((c_cap, 4), np.int32)
            ccnt = int(lib.downsample(_i32p(level_coords), v_cap, level_cnt,
                                      _i32p(parent), _i32p(kpos),
                                      _i32p(coarse), c_cap))
            overflow = overflow or (ccnt > c_cap)
            ccnt = min(ccnt, c_cap)
            parent[parent >= c_cap] = -1
        levels.append(HostLevel(num_voxels=level_cnt, subm_nbr=nbr,
                                parent_idx=parent, parent_kpos=kpos))
        if li < num_levels - 1:
            level_coords = coarse
            level_cnt = ccnt

    v0 = levels[0].subm_nbr.shape[1]
    if stem_kernel != 3:
        k = np.ascontiguousarray(kernel_offsets(stem_kernel))
        stem = np.empty((k.shape[0], v0), np.int32)
        lib.neighbor_table(_i32p(vox), v0, cnt, _i32p(k), k.shape[0],
                           _i32p(stem))
    else:
        stem = levels[0].subm_nbr
    return HostPlan(inverse_mapping=inverse, levels=levels, stem_nbr=stem,
                    overflow=overflow)


def host_plan_to_device(plan: HostPlan):
    """HostPlan -> (UNetPlan pytree, inverse_mapping) of jnp arrays.

    The resulting Levels carry no hash (host already resolved every index).
    """
    import jax.numpy as jnp

    from segdino3d_tpu.models.backbone.res16unet import UNetPlan
    from segdino3d_tpu.ops.sparse_conv import Level

    levels = []
    for hl in plan.levels:
        v = hl.subm_nbr.shape[1]
        valid = jnp.arange(v, dtype=jnp.int32) < hl.num_voxels
        levels.append(Level(
            coords_T=jnp.zeros((4, v), jnp.int32),
            key=jnp.zeros((v,), jnp.uint32),
            valid=valid,
            hash=None,
            num_voxels=jnp.asarray(hl.num_voxels, jnp.int32),
            parent_idx=None if hl.parent_idx is None else jnp.asarray(hl.parent_idx),
            parent_kpos=None if hl.parent_kpos is None else jnp.asarray(hl.parent_kpos),
        ))
    uplan = UNetPlan(
        levels=tuple(levels),
        subm_nbr=tuple(jnp.asarray(hl.subm_nbr) for hl in plan.levels),
        stem_nbr=jnp.asarray(plan.stem_nbr),
    )
    return uplan, jnp.asarray(plan.inverse_mapping)
