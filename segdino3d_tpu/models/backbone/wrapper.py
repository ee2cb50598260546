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

import flax.linen as nn
import jax.numpy as jnp

from segdino3d_tpu.gtypes import BackboneOutput, SceneBatch
from segdino3d_tpu.ops import scatter
from segdino3d_tpu.ops.voxelize import devoxelize, voxelize
from segdino3d_tpu.models.backbone.res16unet import build_unet_plan


def flat_batch_index(b: int, p: int):
    return jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)


def superpoint_segment_ids(superpoint_ids: jnp.ndarray, s_cap: int):
    """Global segment id (b * S + sp) for flattened points."""
    b = superpoint_ids.shape[0]
    sp = jnp.clip(superpoint_ids, 0, s_cap - 1)
    return (jnp.arange(b, dtype=jnp.int32)[:, None] * s_cap + sp).reshape(-1)


class SparseBackboneWrapper(nn.Module):
    """Wraps a sparse U-Net with voxelize / unpool / superpoint pooling."""
    unet: nn.Module
    voxel_size: float = 0.02
    s_cap: int = 1024
    voxel_cap: Optional[int] = None
    level_caps: Optional[Sequence[int]] = None
    # static per-level voxel capacities as fractions of voxel_cap; surfaces
    # shrink ~3.5x per 2x downsample, these are safe upper bounds
    level_cap_ratios: Sequence[float] = (1.0, 0.7, 0.35, 0.12, 0.05)
    stem_kernel: int = 5
    mode_fuse_2d_feat: str = "early_fusion"
    include_centered_xyz: bool = False  # SpConvUNet path adds xyz - mean(xyz)
    # SpConvUNet path: the reference quantizes (p - p.min(0)) / voxel
    # (spconvunet.py:286) — a NON-integer shift applied before flooring,
    # so boundary points can land differently than floor(p/voxel) would;
    # shift by the exact per-scene min to reproduce its voxel grid.  The
    # Res16UNet path applies no shift (minkunet.py:624), which our
    # multiple-of-16 integer shift matches exactly (floor(x - 16k) =
    # floor(x) - 16k, and 16 = 2^4 preserves stride-2 anchoring).
    exact_min_shift: bool = False
    compute_dtype: str = "float32"
    shift_to_origin: bool = True        # spconv path min-shifts by raw min

    @nn.compact
    def __call__(self, batch: SceneBatch, train: bool = False):
        b, p = batch.points.shape[:2]
        n = b * p
        s_cap = self.s_cap
        dtype = jnp.dtype(self.compute_dtype)
        bidx = flat_batch_index(b, p)

        pts = batch.points.reshape(n, 6)
        pvalid = batch.point_valid.reshape(n)

        big = jnp.asarray(1e9, pts.dtype)
        if batch.elastic_coords is not None:
            coords_vox = batch.elastic_coords.reshape(n, 3)  # voxel units
        else:
            coords_vox = pts[:, :3] / self.voxel_size

        # per-scene min shift for the conv grid (see ``exact_min_shift``;
        # ``coords_vox`` stays unshifted — superpoint positions below use
        # the reference's shift-free quantization, spconvunet.py:317-360)
        if self.exact_min_shift and batch.elastic_coords is None:
            # subtract in metric space BEFORE dividing — bit-identical to
            # the reference's (p - p.min(0)) / voxel (spconvunet.py:286)
            xyz = batch.points[..., :3]
            masked = jnp.where(batch.point_valid[..., None], xyz, big)
            mins = jnp.min(masked, axis=1)
            coords_shifted = ((xyz - mins[:, None, :])
                              / self.voxel_size).reshape(n, 3)
        else:
            per_scene = coords_vox.reshape(b, p, 3)
            masked = jnp.where(batch.point_valid[..., None], per_scene, big)
            mins = jnp.min(masked, axis=1)
            if not self.exact_min_shift:
                mins = jnp.floor(mins / 16.0) * 16.0
            coords_shifted = coords_vox - jnp.repeat(mins, p, axis=0)

        feats = pts[:, 3:]
        if self.include_centered_xyz:
            # spconv path: append xyz centered on the raw per-scene mean
            # (reference spconvunet.py:287)
            w = batch.point_valid[..., None].astype(pts.dtype)
            mean_xyz = (batch.points[..., :3] * w).sum(1) / jnp.maximum(
                w.sum(1), 1.0)
            centered = (batch.points[..., :3] - mean_xyz[:, None, :]).reshape(n, 3)
            feats = jnp.concatenate([feats, centered], axis=-1)
        if (self.mode_fuse_2d_feat == "early_fusion"
                and batch.points_2dfeats is not None):
            feats = jnp.concatenate(
                [feats, batch.points_2dfeats.reshape(n, -1)], axis=-1)
        feats = feats.astype(dtype)

        overflow = jnp.asarray(False)
        if batch.unet_plan is not None:
            # host-built plan: the C++ builder already resolved the voxel
            # dedup + kernel maps (overflow checked host-side); only
            # feature averaging runs on device
            plan = batch.unet_plan
            inverse = batch.plan_inverse_mapping
            v0 = plan.levels[0].valid.shape[0]
            vox_feats = scatter.segment_mean(
                feats, jnp.where(inverse >= 0, inverse, v0), v0, pvalid)
            vox_feats = jnp.where(plan.levels[0].valid[:, None], vox_feats, 0.0)
        else:
            grid = voxelize(bidx, coords_shifted, feats, pvalid,
                            num_voxels_static=self.voxel_cap)
            level_caps = self.level_caps
            if level_caps is None and self.level_cap_ratios is not None:
                v0 = grid.key.shape[0]
                level_caps = [max(256, -(-int(v0 * r) // 256) * 256)
                              for r in self.level_cap_ratios]
                level_caps[0] = v0
            plan = build_unet_plan(grid, num_levels=5,
                                   stem_kernel=self.stem_kernel,
                                   level_caps=level_caps)
            vox_feats = grid.feats
            inverse = grid.inverse_mapping
            overflow = grid.overflow
            for li, l in enumerate(plan.levels):
                overflow = overflow | (l.num_voxels > l.valid.shape[0])
        vox_out = self.unet(vox_feats, plan, train)
        pt_feats = devoxelize(vox_out, inverse, pvalid)

        seg = superpoint_segment_ids(batch.superpoint_ids, s_cap)
        q_with = jnp.floor(coords_vox).astype(jnp.float32) * self.voxel_size
        q_wo = jnp.floor(pts[:, :3] / self.voxel_size).astype(jnp.float32) \
            * self.voxel_size
        # one fused scatter pass per dtype group (bit-identical to three
        # segment_mean calls; scatters are row-issue-bound, width-free)
        sp_feats, sp_pos, sp_pos_wo = scatter.segment_mean_stack(
            [pt_feats, q_with, q_wo], seg, b * s_cap, pvalid)
        sp_feats = sp_feats.reshape(b, s_cap, -1)
        sp_pos = sp_pos.reshape(b, s_cap, 3)
        sp_pos_wo = sp_pos_wo.reshape(b, s_cap, 3)

        sp_valid = (jnp.arange(s_cap, dtype=jnp.int32)[None, :]
                    < batch.num_superpoints[:, None])
        return BackboneOutput(
            sp_feats=jnp.where(sp_valid[..., None], sp_feats, 0.0),
            sp_pos=jnp.where(sp_valid[..., None], sp_pos, 0.0),
            sp_pos_wo_elastic=jnp.where(sp_valid[..., None], sp_pos_wo, 0.0),
            sp_valid=sp_valid,
            overflow=overflow,
        )
