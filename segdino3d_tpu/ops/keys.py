"""Coordinate-key utilities for sparse voxel tensors.

A sparse voxel coordinate is ``(b, x, y, z)`` int32.  We need to sort, dedup
and look up such coordinates inside jit with static shapes.  int64 on TPU is
undesirable, so a coordinate is packed into a *pair* of int32 keys ``(hi,
lo)`` ordered lexicographically:

    hi = b * 2**20 + x          (b < 2**10,  0 <= x < 2**20)
    lo = y * 2**15 + z          (0 <= y < 2**16, 0 <= z < 2**15)

All coordinates are shifted to be non-negative before packing (voxelization
does a per-scene min-shift, mirroring the reference collate at
``/root/reference/segdino3d/models/backbone/spconvunet.py:286``).  Invalid /
padded entries use the sentinel ``(INT32_MAX, INT32_MAX)`` which sorts last
and never matches a real coordinate.

Lookups are vectorized lower-bound binary searches over the sorted pair —
O(log V) gathers, embarrassingly parallel, TPU friendly (no dynamic shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = jnp.iinfo(jnp.int32).max

# Packing limits (see module docstring).
_X_BITS = 20
_Y_SHIFT = 15  # lo = y << 15 | z

# --- single-word uint32 packing (hot path) ---
# b(3) | x(10) | y(10) | z(9): batch < 8 per shard, extent < 1024x1024x512
# voxels per scene (20.5m x 20.5m x 10.2m at 2cm). The coordinate hash uses
# this 1-word key so a probe is a single gather; the (hi, lo) pair packing
# above remains for capacity-unconstrained utilities.
U32_B_BITS = 3
U32_X_BITS = 10
U32_Y_BITS = 10
U32_Z_BITS = 9
# NOTE: a numpy (not jnp) scalar on purpose — creating a device array at
# import time would initialize a jax backend in every process that merely
# imports this module (data-loader workers must stay device-free).
U32_SENTINEL = np.uint32(0xFFFFFFFF)


def pack_coords_u32(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Pack (N, 4) int32 ``(b, x, y, z)`` into one uint32 key.

    Out-of-range coordinates are mapped to the sentinel (treated invalid) —
    callers see them as absent neighbors / dropped voxels and the voxelizer
    raises its overflow flag.
    """
    # transpose once: column extraction from a row-major (N, 4) array
    # otherwise lowers to strided accesses with pathological TPU layouts
    bxyz = coords.T
    return pack_columns_u32(bxyz[0], bxyz[1], bxyz[2], bxyz[3], valid)


def pack_columns_u32(b, x, y, z, valid) -> jnp.ndarray:
    """SoA variant of :func:`pack_coords_u32` (hot path)."""
    in_range = (
        (b >= 0) & (b < (1 << U32_B_BITS))
        & (x >= 0) & (x < (1 << U32_X_BITS))
        & (y >= 0) & (y < (1 << U32_Y_BITS))
        & (z >= 0) & (z < (1 << U32_Z_BITS)))
    key = (
        (b.astype(jnp.uint32) << (U32_X_BITS + U32_Y_BITS + U32_Z_BITS))
        | (x.astype(jnp.uint32) << (U32_Y_BITS + U32_Z_BITS))
        | (y.astype(jnp.uint32) << U32_Z_BITS)
        | z.astype(jnp.uint32))
    # the all-ones coordinate would alias the sentinel; treat it as invalid
    return jnp.where(valid & in_range & (key != U32_SENTINEL),
                     key, U32_SENTINEL)


def key_delta_u32(dx: int, dy: int, dz: int) -> int:
    """The uint32 increment that shifts a packed key by (dx, dy, dz)
    (two's-complement wraparound; field under/overflow must be guarded by
    the caller via ``neighbor_wrap_masks``)."""
    d = (dx << (U32_Y_BITS + U32_Z_BITS)) + (dy << U32_Z_BITS) + dz
    return d & 0xFFFFFFFF


def neighbor_wrap_masks(coords_T: jnp.ndarray, max_delta: int):
    """Per-dimension border masks for key-delta neighbor queries.

    Args:
        coords_T: (4, N) int32 SoA coordinates.
        max_delta: largest |offset| used (1 for k3, 2 for k5).

    Returns dict (dim, delta) -> (N,) bool 'would wrap' where dim in
    {1, 2, 3} (x, y, z) and delta in +-1..+-max_delta.
    """
    lims = {1: 1 << U32_X_BITS, 2: 1 << U32_Y_BITS, 3: 1 << U32_Z_BITS}
    masks = {}
    for dim in (1, 2, 3):
        c = coords_T[dim]
        for m in range(1, max_delta + 1):
            masks[(dim, -m)] = c < m
            masks[(dim, m)] = c >= lims[dim] - m
    return masks


def pack_coords(coords: jnp.ndarray, valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pack (N, 4) int32 ``(b, x, y, z)`` coords into lexicographic (hi, lo).

    Caller guarantees 0 <= x < 2**20, 0 <= y < 2**16, 0 <= z < 2**15,
    0 <= b < 2**10. Invalid rows map to the sentinel.
    """
    b, x, y, z = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    hi = (b << _X_BITS) | x
    lo = (y << _Y_SHIFT) | z
    hi = jnp.where(valid, hi, INT32_MAX)
    lo = jnp.where(valid, lo, INT32_MAX)
    return hi, lo


def lexsort_keys(hi, lo, *payloads):
    """Sort by (hi, lo) ascending; payloads are permuted along."""
    return jax.lax.sort((hi, lo) + tuple(payloads), num_keys=2)


def _lex_less(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def searchsorted_pair(sorted_hi: jnp.ndarray, sorted_lo: jnp.ndarray,
                      q_hi: jnp.ndarray, q_lo: jnp.ndarray) -> jnp.ndarray:
    """Vectorized lower-bound of query pairs in a (hi, lo)-sorted array.

    Returns, for each query, the first index ``i`` with
    ``sorted[i] >= query`` (0..N). Works on any query shape.
    """
    n = sorted_hi.shape[0]
    n_iters = max(1, (n - 1).bit_length()) if n > 1 else 1

    lo_idx = jnp.zeros(q_hi.shape, jnp.int32)
    hi_idx = jnp.full(q_hi.shape, n, jnp.int32)

    def body(_, carry):
        lo_i, hi_i = carry
        mid = (lo_i + hi_i) >> 1
        m_hi = sorted_hi[mid]
        m_lo = sorted_lo[mid]
        go_right = _lex_less(m_hi, m_lo, q_hi, q_lo)  # sorted[mid] < query
        lo_i = jnp.where(go_right, mid + 1, lo_i)
        hi_i = jnp.where(go_right, hi_i, mid)
        return lo_i, hi_i

    lo_idx, hi_idx = jax.lax.fori_loop(0, n_iters + 1, body, (lo_idx, hi_idx))
    return lo_idx


def lookup_coords(sorted_hi: jnp.ndarray, sorted_lo: jnp.ndarray,
                  q_hi: jnp.ndarray, q_lo: jnp.ndarray) -> jnp.ndarray:
    """Find the index of each query coordinate in the sorted key arrays.

    Returns int32 indices, ``-1`` where the query is absent (including all
    sentinel queries, since sentinels never *match* — searchsorted lands on a
    sentinel slot but equality with a valid key fails, and sentinel==sentinel
    matches are filtered by the caller marking queries invalid beforehand).
    """
    n = sorted_hi.shape[0]
    pos = searchsorted_pair(sorted_hi, sorted_lo, q_hi, q_lo)
    pos_c = jnp.minimum(pos, n - 1)
    found = (sorted_hi[pos_c] == q_hi) & (sorted_lo[pos_c] == q_lo) & (q_hi != INT32_MAX)
    return jnp.where(found & (pos < n), pos_c, -1).astype(jnp.int32)


def unique_consecutive(hi: jnp.ndarray, lo: jnp.ndarray):
    """Segment ids for a *sorted* key sequence.

    Returns (segment_id, is_first, num_unique) where num_unique counts only
    non-sentinel keys.
    """
    prev_hi = jnp.concatenate([jnp.full((1,), -1, hi.dtype), hi[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), -1, lo.dtype), lo[:-1]])
    is_first = (hi != prev_hi) | (lo != prev_lo)
    seg_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    valid = hi != INT32_MAX
    num_unique = jnp.sum((is_first & valid).astype(jnp.int32))
    return seg_id, is_first, num_unique
