"""Voxelization with ME-TensorField semantics, static shapes.

Replicates the behavior of ``ME.utils.batch_sparse_collate`` +
``ME.TensorField.sparse()`` + ``field.inverse_mapping`` used by the reference
backbones (``/root/reference/segdino3d/models/backbone/minkunet.py:624-631``,
``spconvunet.py:284-315``): floor-quantize point coordinates, deduplicate,
average the features of points falling in the same voxel (TensorField's
UNWEIGHTED_AVERAGE mode) and keep the point->voxel inverse mapping for the
voxel->point ``slice`` unpooling.

Everything is static-shape: N padded points in, V padded voxels out, with
validity masks.  Voxel ids are assigned in key-sorted order so the voxel
arrays are sorted by coordinate key — kernel-map construction reuses this.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from segdino3d_tpu.ops import keys as K


class VoxelGrid(NamedTuple):
    """A batch-flattened sparse voxel tensor (key-sorted)."""
    coords: jnp.ndarray        # (V, 4) int32 (b, x, y, z); invalid rows arbitrary
    feats: jnp.ndarray         # (V, C) float
    valid: jnp.ndarray         # (V,) bool
    key_hi: jnp.ndarray        # (V,) int32 sorted key (sentinel on invalid)
    key_lo: jnp.ndarray        # (V,) int32
    num_voxels: jnp.ndarray    # () int32 (dynamic, <= V)
    inverse_mapping: jnp.ndarray  # (N,) int32 point -> voxel id (undefined for invalid points)
    overflow: jnp.ndarray      # () bool: true voxel count exceeded static V


def voxelize(batch_idx: jnp.ndarray,
             coords_f: jnp.ndarray,
             feats: jnp.ndarray,
             valid: jnp.ndarray,
             num_voxels_static: int | None = None) -> VoxelGrid:
    """Quantize points into a sparse voxel grid.

    Args:
        batch_idx: (N,) int32 scene index per point.
        coords_f: (N, 3) float point coordinates already divided by voxel
            size (and min-shifted to be >= 0 by the caller when required).
        feats: (N, C) features to average per voxel.
        valid: (N,) bool.
        num_voxels_static: static output voxel capacity V (default N).

    Floor-quantization matches ME's ``batch_sparse_collate`` which floors
    float coordinates to int.
    """
    n = coords_f.shape[0]
    v_cap = num_voxels_static or n

    ijk = jnp.floor(coords_f).astype(jnp.int32)
    ijk = jnp.maximum(ijk, 0)  # caller min-shifts; clamp for safety on aug jitter
    coords = jnp.concatenate([batch_idx[:, None].astype(jnp.int32), ijk], axis=1)
    hi, lo = K.pack_coords(coords, valid)

    point_idx = jnp.arange(n, dtype=jnp.int32)
    s_hi, s_lo, s_pt = K.lexsort_keys(hi, lo, point_idx)
    seg_id, is_first, num_unique = K.unique_consecutive(s_hi, s_lo)
    overflow = num_unique > v_cap

    # point -> voxel id in original order
    inverse = jnp.zeros((n,), jnp.int32).at[s_pt].set(seg_id)

    # voxel coords/keys: first occurrence of each segment
    vox_slot = jnp.where(is_first, seg_id, v_cap)  # invalid -> dumped in overflow row
    coords_sorted = coords[s_pt]
    vox_coords = jnp.zeros((v_cap + 1, 4), jnp.int32).at[vox_slot].set(coords_sorted)[:v_cap]
    vox_hi = jnp.full((v_cap + 1,), K.INT32_MAX, jnp.int32).at[vox_slot].set(s_hi)[:v_cap]
    vox_lo = jnp.full((v_cap + 1,), K.INT32_MAX, jnp.int32).at[vox_slot].set(s_lo)[:v_cap]

    vox_valid = jnp.arange(v_cap, dtype=jnp.int32) < num_unique
    # sentinel rows created via .set above already carry sentinel keys for
    # segments made purely of invalid points; force consistency:
    vox_hi = jnp.where(vox_valid, vox_hi, K.INT32_MAX)
    vox_lo = jnp.where(vox_valid, vox_lo, K.INT32_MAX)

    # unweighted average of point features per voxel
    w = valid.astype(feats.dtype)
    inv_clip = jnp.minimum(inverse, v_cap)  # guard overflow
    sums = jax.ops.segment_sum(feats * w[:, None], inv_clip, num_segments=v_cap + 1)[:v_cap]
    cnts = jax.ops.segment_sum(w, inv_clip, num_segments=v_cap + 1)[:v_cap]
    vox_feats = sums / jnp.maximum(cnts, 1.0)[:, None]
    vox_feats = jnp.where(vox_valid[:, None], vox_feats, 0.0)

    return VoxelGrid(
        coords=vox_coords,
        feats=vox_feats,
        valid=vox_valid,
        key_hi=vox_hi,
        key_lo=vox_lo,
        num_voxels=num_unique,
        inverse_mapping=inverse,
        overflow=overflow,
    )


def devoxelize(vox_feats: jnp.ndarray, inverse_mapping: jnp.ndarray,
               point_valid: jnp.ndarray) -> jnp.ndarray:
    """Voxel -> point unpooling (ME ``x.slice(field)``)."""
    out = jnp.take(vox_feats, inverse_mapping, axis=0, mode="fill", fill_value=0)
    return jnp.where(point_valid[:, None], out, 0.0)
