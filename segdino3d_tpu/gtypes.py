"""Typed batch containers (pytrees) for the 3D instance-seg pipeline.

TPU-native counterpart of the reference's ``GD3DTarget`` attribute-dict
(``/root/reference/segdino3d/gtypes.py:3-94``) and its per-scene python
lists: here a batch is a single **padded, statically-shaped pytree** so the
whole pipeline jits and shards over a device mesh. Ragged per-scene tensors
(points, superpoints, instances, 2D queries) are padded to static capacities
with validity masks.

Shape symbols: B scenes, P points, S superpoints, I instances,
K 2D (DINO-X) object queries, C_sem semantic classes.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SceneBatch:
    """One batch of padded scenes (device pytree)."""

    # geometry + appearance
    points: jnp.ndarray              # (B, P, 6) xyz + normalized rgb
    point_valid: jnp.ndarray         # (B, P) bool
    superpoint_ids: jnp.ndarray      # (B, P) int32 in [0, S); pad rows arbitrary
    num_superpoints: jnp.ndarray     # (B,) int32
    # precomputed DINO-X features
    points_2dfeats: Optional[jnp.ndarray] = None   # (B, P, 256)
    query2d_feats: Optional[jnp.ndarray] = None    # (B, K, 256)
    query2d_pos: Optional[jnp.ndarray] = None      # (B, K, 3)
    query2d_valid: Optional[jnp.ndarray] = None    # (B, K) bool
    # train-time elastic augmentation (voxel units, reference
    # ElasticTransfrom writes targets['elastic_coords'])
    elastic_coords: Optional[jnp.ndarray] = None   # (B, P, 3)
    elastic_query2d_pos: Optional[jnp.ndarray] = None  # (B, K, 3)
    # ground truth
    inst_labels: Optional[jnp.ndarray] = None      # (B, I) int32
    inst_valid: Optional[jnp.ndarray] = None       # (B, I) bool
    point_inst_ids: Optional[jnp.ndarray] = None   # (B, P) int32, -1 = none
    sp_inst_masks: Optional[jnp.ndarray] = None    # (B, I, S) bool
    sp_sem_masks: Optional[jnp.ndarray] = None     # (B, C_sem+1, S) bool
    # bookkeeping
    scene_idx: Optional[jnp.ndarray] = None        # (B,) int32
    # host-built sparse-conv plan (ops.host_plan): when present, the
    # backbone skips on-device voxelization/kernel-map building entirely
    unet_plan: Optional[object] = None             # UNetPlan pytree
    plan_inverse_mapping: Optional[jnp.ndarray] = None  # (B*P,) int32

    @property
    def batch_size(self) -> int:
        return self.points.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[1]

    @property
    def sp_capacity(self) -> int:
        return self.sp_inst_masks.shape[2] if self.sp_inst_masks is not None else 0


@struct.dataclass
class BackboneOutput:
    """Superpoint-level features + positions (padded dense batch)."""
    sp_feats: jnp.ndarray            # (B, S, C)
    sp_pos: jnp.ndarray              # (B, S, 3) centroids (with elastic)
    sp_pos_wo_elastic: jnp.ndarray   # (B, S, 3) centroids (raw coords)
    sp_valid: jnp.ndarray            # (B, S) bool
    overflow: Optional[jnp.ndarray] = None  # () bool: any voxel/level cap hit
