"""Res16UNet34C sparse U-Net backbone (TPU-native).

Re-implementation of the Mask3D-style Minkowski Res16UNet used for the
ScanNet200 config (reference ``/root/reference/segdino3d/models/backbone/
minkunet.py:257-694``): stem k5 conv, 4 down stages (k2 s2) with BasicBlock
stacks LAYERS=(2,3,4,6,2,2,2,2), 4 transpose-conv up stages with skip
concatenation, PLANES=(32,64,128,256,256,128,96,96), 96-ch output.

Two execution strategies share the same parameter tree
(``ops.conv_ctx``):

* **block-dense** (production, used when the host plan carries block
  tables): each level's voxels are packed into aligned ``edge``^3 dense
  tiles; submanifold convs run as real MXU convolutions with face-halo
  exchange, and per-voxel gathers happen only at stage boundaries
  (``ops.block_dense``);
* **gather-GEMM** (reference/fallback): per-conv neighbor-table gathers
  (``ops.sparse_conv``).

All tensors are padded with validity masks.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from segdino3d_tpu.ops import sparse_conv as SC
from segdino3d_tpu.ops.conv_ctx import CompactStemCtx, DenseCtx, GatherCtx
from segdino3d_tpu.ops.voxelize import VoxelGrid
from segdino3d_tpu.models.layers import MaskedBatchNorm
from segdino3d_tpu.registry import BACKBONES


class UNetPlan(NamedTuple):
    """Coordinate pyramid + index tables for one U-Net forward."""
    levels: Tuple[SC.Level, ...]
    subm_nbr: Tuple[Optional[jnp.ndarray], ...]  # per level: (27, V_l) or None
    stem_nbr: Optional[jnp.ndarray]     # level 0: (k^3, V_0) for the stem conv
    blocks: Optional[tuple] = None      # per level: block_dense.BlockTables
    # degree-compacted stem tables (slots (D, V0), ov_src (P,), ov_dst
    # (P,)); when present the stem runs SC.stem_compact_conv
    stem_compact: Optional[tuple] = None


def build_unet_plan(grid: VoxelGrid, num_levels: int = 5,
                    stem_kernel: int = 5,
                    level_caps: Optional[Sequence[int]] = None) -> UNetPlan:
    plan = SC.build_conv_plan(grid, num_levels, level_caps)
    k3 = SC.kernel_offsets(3)
    subm = tuple(SC._neighbor_table(l, k3) for l in plan.levels)
    if stem_kernel != 3:
        stem = SC._neighbor_table(plan.levels[0],
                                  SC.kernel_offsets(stem_kernel))
    else:
        stem = subm[0]
    return UNetPlan(levels=plan.levels, subm_nbr=subm, stem_nbr=stem)


def make_level_ctxs(plan: UNetPlan):
    """One conv-execution context per pyramid level (+ the stem's).

    Levels whose plan carries ``BlockTables`` run block-dense; the rest run
    gather-GEMM over their 27-neighbor tables.  Mixed plans are fine (the
    host loader picks per-level strategies by measured occupancy).

    When a block-dense level 0 ALSO carries ``stem_nbr`` (host plan built
    with ``stem_gather=True``), the stem runs gather-GEMM while the rest
    of level 0 stays block-dense — the measured optimum on v5e: the dense
    k5 stem pays ~50ms of 259-channel halo traffic, the gather ResNet
    blocks pay ~2x their dense cost."""
    blocks = plan.blocks if plan.blocks is not None else (None,) * len(plan.levels)
    ctxs = []
    for li, (t, l) in enumerate(zip(blocks, plan.levels)):
        if t is not None:
            ctxs.append(DenseCtx(t, l.valid))
        else:
            ctxs.append(GatherCtx(plan.subm_nbr[li], l.valid))
    if plan.stem_compact is not None:
        slots, ov_src, ov_dst = plan.stem_compact
        stem_ctx = CompactStemCtx(slots, ov_src, ov_dst,
                                  plan.levels[0].valid)
    elif blocks[0] is not None and plan.stem_nbr is None:
        stem_ctx = ctxs[0]
    else:
        stem_ctx = GatherCtx(plan.stem_nbr, plan.levels[0].valid)
    return ctxs, stem_ctx


class SubMConv(nn.Module):
    """Submanifold conv (param holder; execution delegated to the ctx)."""
    out_channels: int
    kernel_volume: int = 27

    @nn.compact
    def __call__(self, feats, ctx):
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (self.kernel_volume, feats.shape[-1], self.out_channels))
        return ctx.subm(feats, w.astype(feats.dtype))


class DownConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, feats, fine, coarse):
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (8, feats.shape[-1], self.out_channels))
        return SC.down_conv(feats, fine, coarse, w.astype(feats.dtype))


class UpConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, feats, fine):
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (8, feats.shape[-1], self.out_channels))
        return SC.up_conv(feats, fine, w.astype(feats.dtype))


class BasicBlock(nn.Module):
    """Minkowski BasicBlock (reference ``minkunet.py:195-250``)."""
    planes: int
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, ctx, train: bool):
        residual = x
        out = SubMConv(self.planes, name="conv1")(x, ctx)
        out = MaskedBatchNorm(momentum=self.bn_momentum, name="norm1")(
            out, ctx.valid, use_running_average=not train)
        out = nn.relu(out)
        out = SubMConv(self.planes, name="conv2")(out, ctx)
        out = MaskedBatchNorm(momentum=self.bn_momentum, name="norm2")(
            out, ctx.valid, use_running_average=not train)
        if x.shape[-1] != self.planes:
            # dtype=x.dtype: flax Dense otherwise promotes bf16 input x
            # f32 kernel -> f32, and `out + residual` would poison every
            # downstream layer back to f32 (found via per-fusion trace
            # attribution: block2+ ran f32 under bf16 compute)
            residual = nn.Dense(self.planes, use_bias=False,
                                dtype=x.dtype, name="downsample_conv")(x)
            residual = MaskedBatchNorm(momentum=self.bn_momentum,
                                       name="downsample_norm")(
                residual, ctx.valid, use_running_average=not train)
        out = out + residual
        return nn.relu(out)


@BACKBONES.register_module()
class Res16UNet34C(nn.Module):
    """See module docstring. ``config`` mirrors the reference dict
    (``configs/models/base_3d.py:10-13``): bn_momentum, conv1_kernel_size."""
    in_channels: int = 259
    out_channels: int = 96
    config: dict = None
    voxel_size: float = 0.02
    mode_fuse_2d_feat: str = "early_fusion"
    add_positional_embedding: bool = True
    remat: bool = False   # activation checkpointing per BasicBlock
    # (reference: torch.utils.checkpoint toggles,
    #  instance_seg_3d_decoder.py:270-284 / decoder use_activation_checkpoint)

    PLANES = (32, 64, 128, 256, 256, 128, 96, 96)
    LAYERS = (2, 3, 4, 6, 2, 2, 2, 2)
    INIT_DIM = 32

    def _blocks(self, x, n_blocks, planes, ctx, train, name):
        block_cls = nn.remat(BasicBlock, static_argnums=(3,)) if self.remat \
            else BasicBlock
        for i in range(n_blocks):
            x = block_cls(planes, bn_momentum=self.bn_mom,
                          name=f"{name}_{i}")(x, ctx, train)
        return x

    @property
    def bn_mom(self):
        return (self.config or {}).get("bn_momentum", 0.02)

    @nn.compact
    def __call__(self, feats: jnp.ndarray, plan: UNetPlan, train: bool = False):
        """feats: (V0, in_channels) level-0 voxel features."""
        P, L = self.PLANES, self.LAYERS
        lv = plan.levels
        ctxs, stem_ctx = make_level_ctxs(plan)
        bn = lambda name: MaskedBatchNorm(momentum=self.bn_mom, name=name)

        # stem (pixel_dist 1)
        stem_vol = (plan.stem_nbr.shape[0] if plan.stem_nbr is not None
                    else (self.config or {}).get("conv1_kernel_size", 5) ** 3)
        out = stem_ctx.enter(feats)
        out = SubMConv(self.INIT_DIM, kernel_volume=stem_vol,
                       name="conv0p1s1")(out, stem_ctx)
        out = bn("bn0")(out, stem_ctx.valid, use_running_average=not train)
        out_p1 = nn.relu(out)   # kept in ctx layout for the final skip concat
        if stem_ctx is not ctxs[0]:
            # hybrid stem: move into level-0's layout (identity when both
            # are gather; one 32-ch scatter_to_dense when L0 is dense)
            out_p1 = ctxs[0].enter(stem_ctx.exit(out_p1))

        # down 1
        out = DownConv(self.INIT_DIM, name="conv1p1s2")(
            ctxs[0].exit(out_p1), lv[0], lv[1])
        out = ctxs[1].enter(out)
        out = bn("bn1")(out, ctxs[1].valid, use_running_average=not train)
        out = nn.relu(out)
        out_b1p2 = self._blocks(out, L[0], P[0], ctxs[1], train, "block1")
        # down 2
        out = DownConv(P[0], name="conv2p2s2")(
            ctxs[1].exit(out_b1p2), lv[1], lv[2])
        out = ctxs[2].enter(out)
        out = bn("bn2")(out, ctxs[2].valid, use_running_average=not train)
        out = nn.relu(out)
        out_b2p4 = self._blocks(out, L[1], P[1], ctxs[2], train, "block2")
        # down 3
        out = DownConv(P[1], name="conv3p4s2")(
            ctxs[2].exit(out_b2p4), lv[2], lv[3])
        out = ctxs[3].enter(out)
        out = bn("bn3")(out, ctxs[3].valid, use_running_average=not train)
        out = nn.relu(out)
        out_b3p8 = self._blocks(out, L[2], P[2], ctxs[3], train, "block3")
        # down 4 (pixel_dist 16)
        out = DownConv(P[2], name="conv4p8s2")(
            ctxs[3].exit(out_b3p8), lv[3], lv[4])
        out = ctxs[4].enter(out)
        out = bn("bn4")(out, ctxs[4].valid, use_running_average=not train)
        out = nn.relu(out)
        out = self._blocks(out, L[3], P[3], ctxs[4], train, "block4")

        # up 4 -> pixel_dist 8
        out = UpConv(P[4], name="convtr4p16s2")(ctxs[4].exit(out), lv[3])
        out = ctxs[3].enter(out)
        out = bn("bntr4")(out, ctxs[3].valid, use_running_average=not train)
        out = nn.relu(out)
        out = jnp.concatenate([out, out_b3p8], axis=-1)
        out = self._blocks(out, L[4], P[4], ctxs[3], train, "block5")
        # up 5 -> pixel_dist 4
        out = UpConv(P[5], name="convtr5p8s2")(ctxs[3].exit(out), lv[2])
        out = ctxs[2].enter(out)
        out = bn("bntr5")(out, ctxs[2].valid, use_running_average=not train)
        out = nn.relu(out)
        out = jnp.concatenate([out, out_b2p4], axis=-1)
        out = self._blocks(out, L[5], P[5], ctxs[2], train, "block6")
        # up 6 -> pixel_dist 2
        out = UpConv(P[6], name="convtr6p4s2")(ctxs[2].exit(out), lv[1])
        out = ctxs[1].enter(out)
        out = bn("bntr6")(out, ctxs[1].valid, use_running_average=not train)
        out = nn.relu(out)
        out = jnp.concatenate([out, out_b1p2], axis=-1)
        out = self._blocks(out, L[6], P[6], ctxs[1], train, "block7")
        # up 7 -> pixel_dist 1
        out = UpConv(P[7], name="convtr7p2s2")(ctxs[1].exit(out), lv[0])
        out = ctxs[0].enter(out)
        out = bn("bntr7")(out, ctxs[0].valid, use_running_average=not train)
        out = nn.relu(out)
        out = jnp.concatenate([out, out_p1], axis=-1)
        out = self._blocks(out, L[7], P[7], ctxs[0], train, "block8")
        return ctxs[0].exit(out)
