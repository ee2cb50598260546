"""Backbone forward wrapper: points -> voxels -> U-Net -> superpoints.

TPU-native equivalent of ``Res16UNetBase.forward_wrapper``
(``/root/reference/segdino3d/models/backbone/minkunet.py:603-685``):

1. early-fuse per-point DINO-X features with rgb;
2. voxelize (ME TensorField semantics) with a per-scene min-shift rounded
   down to a multiple of 16 — a pure lattice translation that keeps the
   2x-downsample grouping at every pyramid level identical to the unshifted
   grid, so numerics match the reference's unshifted quantization while our
   int-key packing gets non-negative coordinates;
3. run the sparse U-Net on the flattened voxel batch;
4. unpool voxel->point (``x.slice``), pool point->superpoint via segment
   mean, and compute superpoint centroids of the *quantized* point
   coordinates with and without elastic augmentation
   (``minkunet.py:652-684`` — centroids use floor(coords/voxel)*voxel).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from segdino3d_tpu.gtypes import BackboneOutput, SceneBatch
from segdino3d_tpu.ops import scatter
from segdino3d_tpu.ops.voxelize import devoxelize, voxelize
from segdino3d_tpu.models.backbone.res16unet import build_unet_plan


def _flat_batch(batch: SceneBatch):
    """Flatten (B, P, ...) -> (B*P, ...) with a batch index vector."""
    b, p = batch.points.shape[:2]
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
    return b, p, bidx


def superpoint_segment_ids(batch: SceneBatch, s_cap: int):
    """Global segment id (b * S + sp) for flattened points."""
    b, p, _ = _flat_batch(batch)
    sp = jnp.clip(batch.superpoint_ids, 0, s_cap - 1)
    seg = (jnp.arange(b, dtype=jnp.int32)[:, None] * s_cap + sp).reshape(-1)
    return seg


def run_backbone(
    unet_module,
    unet_variables,
    batch: SceneBatch,
    *,
    voxel_size: float,
    s_cap: int,
    voxel_cap: Optional[int] = None,
    level_caps: Optional[Sequence[int]] = None,
    stem_kernel: int = 5,
    train: bool = False,
    mode_fuse_2d_feat: str = "early_fusion",
    compute_dtype=jnp.float32,
    mutable: bool = False,
):
    """Returns (BackboneOutput, new_batch_stats | None)."""
    b, p, bidx = _flat_batch(batch)
    n = b * p

    pts = batch.points.reshape(n, 6)
    pvalid = batch.point_valid.reshape(n)

    # --- coordinates for the conv grid (elastic when present) ---
    if batch.elastic_coords is not None:
        coords_vox = batch.elastic_coords.reshape(n, 3)  # already voxel units
    else:
        coords_vox = pts[:, :3] / voxel_size

    # per-scene min shift, rounded down to a multiple of 16 (see docstring)
    per_scene = coords_vox.reshape(b, p, 3)
    big = jnp.asarray(1e9, per_scene.dtype)
    masked = jnp.where(batch.point_valid[..., None], per_scene, big)
    mins = jnp.floor(jnp.min(masked, axis=1) / 16.0) * 16.0  # (B, 3)
    shift = jnp.repeat(mins, p, axis=0)
    coords_shifted = coords_vox - shift

    # --- features: rgb (+ centered xyz on some configs) + DINO-X ---
    feats = pts[:, 3:]
    if mode_fuse_2d_feat == "early_fusion" and batch.points_2dfeats is not None:
        feats = jnp.concatenate(
            [feats, batch.points_2dfeats.reshape(n, -1)], axis=-1)
    feats = feats.astype(compute_dtype)

    grid = voxelize(bidx, coords_shifted, feats, pvalid,
                    num_voxels_static=voxel_cap)
    plan = build_unet_plan(grid, num_levels=5, stem_kernel=stem_kernel,
                           level_caps=level_caps)

    if mutable:
        vox_out, updates = unet_module.apply(
            unet_variables, grid.feats, plan, train,
            mutable=["batch_stats"])
    else:
        vox_out = unet_module.apply(unet_variables, grid.feats, plan, train)
        updates = None

    pt_feats = devoxelize(vox_out, grid.inverse_mapping, pvalid)

    # --- superpoint pooling ---
    seg = superpoint_segment_ids(batch, s_cap)
    sp_feats = scatter.segment_mean(pt_feats, seg, b * s_cap, pvalid)
    sp_feats = sp_feats.reshape(b, s_cap, -1)

    # centroids of quantized coords (with elastic / conv grid)
    q_with = jnp.floor(coords_vox).astype(jnp.float32) * voxel_size
    sp_pos = scatter.segment_mean(q_with, seg, b * s_cap, pvalid).reshape(b, s_cap, 3)
    # centroids of quantized raw coords (no elastic)
    q_wo = jnp.floor(pts[:, :3] / voxel_size).astype(jnp.float32) * voxel_size
    sp_pos_wo = scatter.segment_mean(q_wo, seg, b * s_cap, pvalid).reshape(b, s_cap, 3)

    sp_valid = (jnp.arange(s_cap, dtype=jnp.int32)[None, :]
                < batch.num_superpoints[:, None])
    out = BackboneOutput(
        sp_feats=jnp.where(sp_valid[..., None], sp_feats, 0.0),
        sp_pos=jnp.where(sp_valid[..., None], sp_pos, 0.0),
        sp_pos_wo_elastic=jnp.where(sp_valid[..., None], sp_pos_wo, 0.0),
        sp_valid=sp_valid,
    )
    return out, updates, grid
