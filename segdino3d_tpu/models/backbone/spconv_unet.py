"""SpConvUNet backbone (ScanNet v2 config family).

Re-implementation of the SPFormer-style recursive spconv U-Net
(``/root/reference/segdino3d/models/backbone/spconvunet.py:21-399``):
per-level 2x pre-norm ResidualBlocks (submanifold k3), k2 s2 strided down
conv, inverse conv back up sharing the level's index pairs (the
``indice_key`` contract), skip concatenation into a channel-reducing tail
block. Planes ``[32, 64, 96, 128, 160]``; ``input_conv`` takes
rgb(3)+centered-xyz(3)+DINO-X(256) = 262 channels; ``output_layer`` is
BN+ReLU. BatchNorm uses eps=1e-4, momentum=0.1 (``spconvunet.py:36``).

The recursion is unrolled into the same 5-level coordinate pyramid the
Res16UNet uses (``build_unet_plan``) — spconv's cached indice pairs map to
the pyramid's parent links.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from segdino3d_tpu.models.backbone.res16unet import (DownConv, SubMConv,
                                                     UpConv, UNetPlan,
                                                     make_level_ctxs)
from segdino3d_tpu.models.layers import MaskedBatchNorm
from segdino3d_tpu.registry import BACKBONES


class PreNormResidualBlock(nn.Module):
    """norm-relu-conv-norm-relu-conv + (1x1) identity branch, no final relu
    (reference ``ResidualBlock`` with ``normalize_before=True``, :48-64)."""
    out_channels: int
    bn_momentum: float = 0.1
    bn_eps: float = 1e-4

    @nn.compact
    def __call__(self, x, ctx, train: bool):
        bn = lambda name: MaskedBatchNorm(momentum=self.bn_momentum,
                                          eps=self.bn_eps, name=name)
        h = bn("norm1")(x, ctx.valid, use_running_average=not train)
        h = nn.relu(h)
        h = SubMConv(self.out_channels, name="conv1")(h, ctx)
        h = bn("norm2")(h, ctx.valid, use_running_average=not train)
        h = nn.relu(h)
        h = SubMConv(self.out_channels, name="conv2")(h, ctx)
        if x.shape[-1] != self.out_channels:
            # dtype=x.dtype: avoid flax's bf16-x-f32-kernel -> f32
            # promotion leaking f32 into every downstream layer (same
            # fix as res16unet BasicBlock.downsample_conv)
            ident = nn.Dense(self.out_channels, use_bias=False,
                             dtype=x.dtype, name="i_branch")(x)
        else:
            ident = x
        return h + ident


@BACKBONES.register_module()
class SpConvUNet(nn.Module):
    num_planes: Tuple[int, ...] = (32, 64, 96, 128, 160)
    block_reps: int = 2
    in_channels: int = 262
    bn_momentum: float = 0.1
    bn_eps: float = 1e-4

    @nn.compact
    def __call__(self, feats: jnp.ndarray, plan: UNetPlan, train: bool = False):
        planes = self.num_planes
        n_levels = len(planes)
        assert len(plan.levels) >= n_levels
        lv = plan.levels
        ctxs, _ = make_level_ctxs(plan)
        bn = lambda name: MaskedBatchNorm(momentum=self.bn_momentum,
                                          eps=self.bn_eps, name=name)

        # input_conv: submanifold k3 in_channels -> planes[0] (:219-226)
        x = ctxs[0].enter(feats)
        x = SubMConv(planes[0], name="input_conv")(x, ctxs[0])

        # down path: blocks then strided conv, keeping skip activations
        skips = []
        for l in range(n_levels):
            for r in range(self.block_reps):
                x = PreNormResidualBlock(
                    planes[l], self.bn_momentum, self.bn_eps,
                    name=f"blocks_l{l}_{r}")(x, ctxs[l], train)
            if l < n_levels - 1:
                skips.append(x)
                h = bn(f"down_norm_{l}")(x, ctxs[l].valid,
                                         use_running_average=not train)
                h = nn.relu(h)
                x = DownConv(planes[l + 1], name=f"down_conv_{l}")(
                    ctxs[l].exit(h), lv[l], lv[l + 1])
                x = ctxs[l + 1].enter(x)

        # up path: deconv, concat skip, tail blocks (2 - i channel factor)
        for l in range(n_levels - 2, -1, -1):
            h = bn(f"up_norm_{l}")(x, ctxs[l + 1].valid,
                                   use_running_average=not train)
            h = nn.relu(h)
            x = UpConv(planes[l], name=f"up_conv_{l}")(ctxs[l + 1].exit(h),
                                                       lv[l])
            x = ctxs[l].enter(x)
            x = jnp.concatenate([skips[l], x], axis=-1)
            for r in range(self.block_reps):
                x = PreNormResidualBlock(
                    planes[l], self.bn_momentum, self.bn_eps,
                    name=f"tail_l{l}_{r}")(x, ctxs[l], train)

        # output_layer: BN + ReLU (:227-229)
        x = bn("output_norm")(x, ctxs[0].valid, use_running_average=not train)
        return ctxs[0].exit(nn.relu(x))
