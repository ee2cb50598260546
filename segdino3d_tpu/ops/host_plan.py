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
    lib.block_assign.restype = ctypes.c_int64
    lib.block_assign.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int32, i32p, i32p, ctypes.c_int64]
    lib.stem_compact.restype = ctypes.c_int64
    lib.stem_compact.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                 i32p, ctypes.c_int32, ctypes.c_int32,
                                 i32p, i32p, i32p, ctypes.c_int64]
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.probe_plan_counts.restype = None
    lib.probe_plan_counts.argtypes = [i32p, u8p, ctypes.c_int64, i32p,
                                      ctypes.c_int32, i64p, i64p,
                                      i32p, ctypes.c_int32, ctypes.c_int32,
                                      i64p]
    _lib = lib
    return lib


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def probe_voxel_count(coords_f: np.ndarray, batch_idx: np.ndarray,
                      valid: np.ndarray) -> int:
    """Count unique voxels (one cheap dedup pass) — used to pick bucketed
    static capacities before building the full plan."""
    lib = _load()
    n = coords_f.shape[0]
    ijk = np.maximum(np.floor(coords_f).astype(np.int32), 0)
    coords4 = np.ascontiguousarray(
        np.concatenate([batch_idx.astype(np.int32)[:, None], ijk], axis=1))
    valid_u8 = np.ascontiguousarray(valid.astype(np.uint8))
    inverse = np.empty(n, np.int32)
    # cap must be >= the unique count: voxel_dedup sizes its hash table
    # from min(n, cap*2) and the open-addressing map never grows
    vox = np.zeros((n, 4), np.int32)
    return int(lib.voxel_dedup(
        _i32p(coords4), valid_u8.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)), n, _i32p(inverse), _i32p(vox), n))


def probe_plan_counts(coords_f: np.ndarray, batch_idx: np.ndarray,
                      valid: np.ndarray,
                      block_edges: Sequence[int],
                      num_levels: int = 5,
                      stem_kernel: int = 0,
                      stem_slots: int = 0):
    """Count-only plan probe: per-level (unique voxels, blocks) without
    building tables (~10x cheaper than ``build_host_plan``).  Used by the
    eval loader's capacity prescan.

    With ``stem_kernel`` > 0 also counts the level-0 stem pairs beyond
    ``stem_slots`` per voxel (third return value) — pins a deterministic
    compacted-stem overflow capacity per shape rung."""
    lib = _load()
    n = coords_f.shape[0]
    ijk = np.maximum(np.floor(coords_f).astype(np.int32), 0)
    coords4 = np.ascontiguousarray(
        np.concatenate([batch_idx.astype(np.int32)[:, None], ijk], axis=1))
    valid_u8 = np.ascontiguousarray(valid.astype(np.uint8))
    edges = np.zeros(num_levels, np.int32)
    for i, e in enumerate(list(block_edges or [])[:num_levels]):
        edges[i] = int(e)
    voxels = np.zeros(num_levels, np.int64)
    blocks = np.zeros(num_levels, np.int64)
    stem_ov = np.zeros(1, np.int64)
    offs = (np.ascontiguousarray(kernel_offsets(stem_kernel))
            if stem_kernel else np.zeros((1, 3), np.int32))
    lib.probe_plan_counts(
        _i32p(coords4),
        valid_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        _i32p(edges), num_levels,
        voxels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _i32p(offs), offs.shape[0] if stem_kernel else 0,
        int(stem_slots),
        stem_ov.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return voxels, blocks, int(stem_ov[0])


def l0_dense_budget_bytes() -> int:
    """The level-0 dense layout is only worth it when its widest conv runs
    UNCHUNKED (block_dense._CHUNK_BUDGET_BYTES); share that env knob."""
    return int(float(os.environ.get("SEGDINO_CONV_CHUNK_MB", "1024"))
               * 2 ** 20)


def l0_dense_fits(n_blocks: int, edge: int, channels: int = 48,
                  itemsize: int = 2, halo: int = 1,
                  budget: Optional[int] = None) -> bool:
    """Predict whether level-0 dense convs stay off the slow ``lax.map``
    chunking path.  This is the measured v5e layout crossover: block fill
    is scale-invariant (~21% on 2-manifold scenes), but a chunked dense
    conv loses to row-gathers (STATUS r3: 462 vs 305 ms on the 400k-pt
    stress scene) while unchunked dense wins on typical scenes (85.9 vs
    93.9 ms).  ``channels=48``: the widest L0 conv (192-ch block8 concat)
    first takes ``dense_subm_conv``'s exact Cin-halving split down to
    <96 channels; only if the 48-ch halo-padded buffer still exceeds the
    budget does the conv fall onto ``lax.map``."""
    padded = n_blocks * (edge + 2 * halo) ** 3 * channels * itemsize
    return padded <= (l0_dense_budget_bytes() if budget is None else budget)


def voxel_bucket(n: int) -> int:
    """Smallest rung of a ~1.3x geometric ladder >= n (voxel capacities)."""
    m = 2048
    while m < n:
        m = ((max(m + 2048, int(m * 1.3)) + 2047) // 2048) * 2048
    return m


def block_bucket(n: int) -> int:
    """Smallest rung of a fixed ~1.25x geometric ladder >= n (bounds the
    number of distinct compiled shapes across batches)."""
    m = 16
    while m < n:
        m = ((max(m + 16, int(m * 1.25)) + 15) // 16) * 16
    return m


class HostLevel(NamedTuple):
    num_voxels: int
    subm_nbr: np.ndarray            # (27, V) int32
    parent_idx: Optional[np.ndarray]   # (V,) into coarser level
    parent_kpos: Optional[np.ndarray]
    # block-dense layout (None when this level runs gather-GEMM):
    # see ops.block_dense
    num_blocks: int = 0
    vox_slot: Optional[np.ndarray] = None    # (V,) int32
    block_nbr: Optional[np.ndarray] = None   # (26, B_cap) int32
    block_edge: int = 0


class HostPlan(NamedTuple):
    """Numpy plan; ``to_device`` adapts it into the UNetPlan pytree."""
    inverse_mapping: np.ndarray     # (N,) point -> voxel id (-1 invalid)
    levels: List[HostLevel]
    stem_nbr: np.ndarray            # (k^3, V0)
    overflow: bool
    # hybrid intent: run the stem gather-GEMM even though level 0 is
    # block-dense.  Distinct from ``subm_for_dense`` (parity tests build
    # every table but must NOT change the executed path).
    stem_gather: bool = False
    # degree-compacted stem (ops/sparse_conv.stem_compact_conv): slot
    # table (D, V0) of flat indices nbr*k^3+o, plus overflow COO pairs.
    # When present the device stem runs ONE (V,Cin)@(Cin,k^3*Cout) matmul
    # + D row-gathers instead of k^3 gathers (measured avg stem degree on
    # ScanNet-like surfaces is ~28 of 125).
    stem_slots: Optional[np.ndarray] = None     # (D, V0) int32
    stem_ov_src: Optional[np.ndarray] = None    # (P,) int32 flat idx
    stem_ov_dst: Optional[np.ndarray] = None    # (P,) int32 voxel idx


def stem_slots_default(stem_compact_slots: Optional[int] = None) -> int:
    """The compacted stem's slot count D: explicit > env > default 32
    (measured optimum region on v5e — see tools/stem_bench.py)."""
    return stem_degree_bucket(int(
        stem_compact_slots or int(os.environ.get("SEGDINO_STEM_SLOTS",
                                                 "32"))))


def stem_compact_enabled(explicit: Optional[bool] = None) -> bool:
    """Whether the degree-compacted stem is in play (explicit flag wins,
    else the SEGDINO_STEM_COMPACT opt-in — default off, see the measured
    disposition in ``build_host_plan``)."""
    if explicit is not None:
        return bool(explicit)
    return os.environ.get("SEGDINO_STEM_COMPACT", "0") == "1"


def stem_degree_bucket(d: int) -> int:
    """Slot-count ladder for the compacted stem table (bounds recompiles)."""
    for rung in (8, 12, 16, 24, 32, 48, 64, 96, 128):
        if d <= rung:
            return rung
    return d


def overflow_bucket(n: int) -> int:
    """~1.5x ladder for the overflow-pair capacity."""
    m = 4096
    while m < n:
        m = ((max(m + 4096, int(m * 1.5)) + 4095) // 4096) * 4096
    return m


def build_host_plan(coords_f: np.ndarray,
                    batch_idx: np.ndarray,
                    valid: np.ndarray,
                    level_caps: Sequence[int],
                    num_levels: int = 5,
                    stem_kernel: int = 5,
                    block_edges: Optional[Sequence[int]] = None,
                    block_caps: Optional[Sequence[int]] = None,
                    subm_for_dense: bool = False,
                    stem_gather: bool = False,
                    stem_compact: Optional[bool] = None,
                    stem_compact_slots: Optional[int] = None,
                    stem_ov_cap: Optional[int] = None,
                    l0_budget_bytes: Optional[int] = None) -> HostPlan:
    """coords_f: (N, 3) float voxel-unit coordinates (min-shifted >= 0).

    ``block_edges[l]`` > 0 gives level ``l`` block-dense layout tables
    (``ops.block_dense``) with ``block_caps[l]`` static block slots; such
    levels skip their (27, V) gather tables (the device never reads them)
    unless ``subm_for_dense`` — used by parity tests running both paths.

    ``stem_gather`` builds the stem's (k^3, V0) gather table even when
    level 0 is block-dense, enabling the hybrid inference layout: gather-
    GEMM stem (125-offset halo traffic makes the dense stem ~50ms at 259
    input channels) + block-dense MXU convs for every other level-0 conv
    (the ResNet blocks' dense cost is ~half their row-gather cost).

    ``l0_budget_bytes``: auto layout crossover — after the level-0
    block assignment, predict the widest level-0 dense conv's halo-padded
    buffer (``n_blocks*(edge+2)^3*l0_max_channels*2`` bytes, bf16) and
    fall back to the gather layout for level 0 when it exceeds the
    budget.  This is the *measured* crossover mechanism on v5e: block
    fill is scale-invariant (~21% on 2-manifold scenes at e4), but once
    the padded buffer outgrows ``SEGDINO_CONV_CHUNK_MB`` the dense conv
    chunks through ``lax.map`` and loses to row-gathers (STATUS r3: 400k-
    pt/2cm stress — hybrid 462 ms vs L0-gather 305 ms), while unchunked
    dense wins on typical scenes (85.9 vs 93.9 ms).
    """
    lib = _load()
    block_edges = list(block_edges or [0] * num_levels)
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
        edge = block_edges[li] if li < len(block_edges) else 0
        nbr = None
        if not edge or subm_for_dense:
            nbr = np.empty((27, v_cap), np.int32)
            lib.neighbor_table(_i32p(level_coords), v_cap, level_cnt,
                               _i32p(k3), 27, _i32p(nbr))
        n_blocks, vox_slot, block_nbr = 0, None, None
        if edge:
            fixed = block_caps is not None and block_caps[li]
            # with no fixed cap, assign with the loose bound B <= V and
            # trim to a geometric bucket after (bounds recompile count)
            b_cap = int(block_caps[li]) if fixed else v_cap
            vox_slot = np.empty(v_cap, np.int32)
            block_nbr = np.empty((26, b_cap), np.int32)
            n_blocks = int(lib.block_assign(
                _i32p(level_coords), v_cap, level_cnt, edge,
                _i32p(vox_slot), _i32p(block_nbr), b_cap))
            if (li == 0 and l0_budget_bytes is not None
                    and not l0_dense_fits(
                        int(b_cap) if fixed else n_blocks, edge,
                        budget=l0_budget_bytes)):
                # auto layout crossover: this scene's level-0 dense convs
                # would chunk — run level 0 gather-GEMM instead.  Keyed on
                # the PINNED cap when one is given so every scene of a
                # capacity rung compiles the same program.
                edge = 0
                block_edges[0] = 0
                n_blocks, vox_slot, block_nbr = 0, None, None
                if nbr is None:
                    nbr = np.empty((27, v_cap), np.int32)
                    lib.neighbor_table(_i32p(level_coords), v_cap,
                                       level_cnt, _i32p(k3), 27, _i32p(nbr))
            else:
                overflow = overflow or (n_blocks > b_cap)
                n_blocks = min(n_blocks, b_cap)
                if not fixed:
                    bucket = block_bucket(n_blocks)
                    block_nbr = np.ascontiguousarray(
                        np.pad(block_nbr[:, :n_blocks],
                               ((0, 0), (0, bucket - n_blocks)),
                               constant_values=-1))
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
                                parent_idx=parent, parent_kpos=kpos,
                                num_blocks=n_blocks, vox_slot=vox_slot,
                                block_nbr=block_nbr, block_edge=edge))
        if li < num_levels - 1:
            level_coords = coarse
            level_cnt = ccnt

    stem = None
    slots = ov_src = ov_dst = None
    stem_runs_gather = not block_edges[0] or stem_gather
    if stem_compact is None:
        # default OFF: re-measured in isolation on a clean v5e
        # (tools/stem_bench.py --variants current,prod), the compacted
        # stem is ~3x SLOWER than the plain 125-gather stem (D=32:
        # 113 ms vs 34.4 ms/app; e2e step 160.7 vs 83.5 ms) — random
        # row-gathers over the (V*125, Cout) product table lose HBM
        # locality once that buffer is ~740 MB, so fewer-but-colder
        # gathers cost more than 125 warm ones (the earlier "3.5x win"
        # was measured on a contended host and did not reproduce).
        # Opt in with SEGDINO_STEM_COMPACT=1 to re-evaluate elsewhere.
        stem_compact = (stem_runs_gather and stem_kernel != 3
                        and not subm_for_dense
                        and stem_compact_enabled())
    if stem_compact and stem_runs_gather and stem_kernel != 3:
        k = np.ascontiguousarray(kernel_offsets(stem_kernel))
        d_cap = stem_slots_default(stem_compact_slots)
        slots = np.empty((d_cap, v0_cap), np.int32)
        # deterministic when pinned by the eval prescan (stem_ov_cap);
        # otherwise a 3x-valid heuristic with a rebuild-on-overflow retry
        p_cap = (int(stem_ov_cap) if stem_ov_cap
                 else overflow_bucket(max(4096, 3 * v0_cap)))
        for _attempt in range(2):
            ov_src = np.full(p_cap, -1, np.int32)
            # dump row: v0_cap (the device segment-sum drops it)
            ov_dst = np.full(p_cap, v0_cap, np.int32)
            n_ov = int(lib.stem_compact(
                _i32p(vox), v0_cap, cnt, _i32p(k), k.shape[0], d_cap,
                _i32p(slots), _i32p(ov_src), _i32p(ov_dst), p_cap))
            if n_ov <= p_cap:
                break
            p_cap = overflow_bucket(n_ov)
    elif stem_runs_gather or subm_for_dense:
        if stem_kernel != 3:
            k = np.ascontiguousarray(kernel_offsets(stem_kernel))
            stem = np.empty((k.shape[0], v0_cap), np.int32)
            lib.neighbor_table(_i32p(vox), v0_cap, cnt, _i32p(k), k.shape[0],
                               _i32p(stem))
        else:
            stem = levels[0].subm_nbr
            if stem is None:    # stem_gather over a block-dense level 0
                stem = np.empty((27, v0_cap), np.int32)
                lib.neighbor_table(_i32p(vox), v0_cap, cnt, _i32p(k3), 27,
                                   _i32p(stem))
    return HostPlan(inverse_mapping=inverse, levels=levels, stem_nbr=stem,
                    overflow=overflow, stem_gather=stem_gather,
                    stem_slots=slots, stem_ov_src=ov_src,
                    stem_ov_dst=ov_dst)


def host_plan_to_device(plan: HostPlan, device: bool = True):
    """HostPlan -> (UNetPlan pytree, inverse_mapping) of jnp arrays
    (or numpy arrays with ``device=False`` — used by process-pool loader
    workers, which must not initialize a jax backend).

    The resulting Levels carry no hash (host already resolved every index).
    """
    if device:
        import jax.numpy as jnp
    else:
        jnp = np   # drop-in: only asarray/arange/zeros/int32/uint32 used

    from segdino3d_tpu.models.backbone.res16unet import UNetPlan
    from segdino3d_tpu.ops.sparse_conv import Level

    levels = []
    for hl in plan.levels:
        v = (hl.subm_nbr.shape[1] if hl.subm_nbr is not None
             else hl.vox_slot.shape[0])
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
    blocks = None
    if any(hl.vox_slot is not None for hl in plan.levels):
        from segdino3d_tpu.ops.block_dense import BlockTables

        def _invert_slots(vox_slot, n_dense):
            # dense slot -> voxel id (-1 empty); enables the scatter-free
            # bijection transposes in ops.block_dense
            inv = np.full(n_dense, -1, np.int32)
            m = vox_slot >= 0
            inv[vox_slot[m]] = np.nonzero(m)[0].astype(np.int32)
            return inv

        blocks = tuple(
            None if hl.vox_slot is None else
            BlockTables(vox_slot=jnp.asarray(hl.vox_slot),
                        block_nbr=jnp.asarray(hl.block_nbr),
                        edge=hl.block_edge,
                        slot_vox=jnp.asarray(_invert_slots(
                            hl.vox_slot,
                            hl.block_nbr.shape[1] * hl.block_edge ** 3)))
            for hl in plan.levels)
    # stem_nbr in the DEVICE plan selects the executed stem path
    # (make_level_ctxs): a block-dense level 0 runs the stem gather-GEMM
    # iff the plan was built with stem_gather.  Plans that built every
    # table for parity tests (subm_for_dense) keep the dense stem.
    # Compacted stem tables supersede the plain stem table outright.
    dense_l0 = blocks is not None and blocks[0] is not None
    emit_stem = plan.stem_nbr is not None and (
        not dense_l0 or plan.stem_gather)
    stem_compact = None
    if plan.stem_slots is not None:
        stem_compact = (jnp.asarray(plan.stem_slots),
                        jnp.asarray(plan.stem_ov_src),
                        jnp.asarray(plan.stem_ov_dst))
    uplan = UNetPlan(
        levels=tuple(levels),
        subm_nbr=tuple(None if hl.subm_nbr is None else jnp.asarray(hl.subm_nbr)
                       for hl in plan.levels),
        stem_nbr=(jnp.asarray(plan.stem_nbr) if emit_stem else None),
        blocks=blocks,
        stem_compact=stem_compact,
    )
    return uplan, jnp.asarray(plan.inverse_mapping)
