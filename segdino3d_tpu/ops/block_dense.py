"""Block-dense submanifold convolution: sparse voxels as dense MXU tiles.

The gather-GEMM path (``ops.sparse_conv.subm_conv``) is gather-latency
bound on TPU: every k3 conv issues 27 per-voxel row gathers.  This module
instead packs voxels into axis-aligned ``edge``^3 blocks (host plan:
``native/sparseplan`` ``block_assign``) and runs each conv as a real dense
3D convolution on the MXU:

1. **scatter once per stage**: voxel rows -> flat dense rows
   ``(n_blocks * edge^3, C)`` via the per-voxel ``vox_slot`` table;
2. **halo exchange per conv**: pad each block with its 6 face neighbors'
   boundary slabs, axis-sequentially (z, then y from the z-padded tensor,
   then x from the yz-padded tensor) so edge/corner cells resolve through
   the neighbors' own halos — 6 contiguous block-slab gathers total, no
   26-direction scatter;
3. ``lax.conv_general_dilated`` VALID over the padded blocks (XLA tiles
   this onto the MXU), then mask outputs to occupied voxels — with
   zero-filled empty cells and absent neighbors this is *exactly*
   submanifold convolution semantics (output coords == input coords,
   absent inputs contribute zero — reference: spconv ``SubMConv3d``,
   ``/root/reference/segdino3d/models/backbone/spconvunet.py:42-60``,
   MinkowskiConvolution ``minkunet.py:135-162``);
4. **gather once per stage**: flat dense rows -> voxel rows.

Empty dense cells cost FLOPs (~4-12x for 2D-surface scenes) but run at
MXU speed instead of gather latency, and per-voxel gather traffic drops
from 27/conv to 2/stage.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class BlockTables:
    """Per-level block-dense layout tables.

    A registered pytree whose ``edge`` rides in the treedef (static under
    jit), so the plan alone determines the dense layout."""

    def __init__(self, vox_slot: jnp.ndarray, block_nbr: jnp.ndarray,
                 edge: int):
        self.vox_slot = vox_slot    # (V,) int32 block*edge^3 + local, -1 inv.
        self.block_nbr = block_nbr  # (6, B) int32 face nbrs (-x,+x,-y,+y,-z,+z)
        self.edge = edge

    @property
    def num_blocks(self) -> int:
        return self.block_nbr.shape[1]

    def tree_flatten(self):
        return (self.vox_slot, self.block_nbr), self.edge

    @classmethod
    def tree_unflatten(cls, edge, children):
        return cls(children[0], children[1], edge)


def _take0(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along axis 0 with -1 -> zeros (mode='fill' only handles
    overflow, so remap negatives past the end first)."""
    idx = jnp.where(idx < 0, arr.shape[0], idx)
    return jnp.take(arr, idx, axis=0, mode="fill", fill_value=0)


def scatter_to_dense(feats: jnp.ndarray, tables: BlockTables) -> jnp.ndarray:
    """(V, C) voxel rows -> (B*edge^3, C) flat dense rows (invalid -> dump)."""
    n_dense = tables.num_blocks * tables.edge ** 3
    slot = jnp.where(tables.vox_slot < 0, n_dense, tables.vox_slot)
    return jnp.zeros((n_dense + 1, feats.shape[1]), feats.dtype) \
        .at[slot].set(feats, mode="drop")[:n_dense]


def gather_from_dense(dense: jnp.ndarray, tables: BlockTables) -> jnp.ndarray:
    """(B*edge^3, C) flat dense rows -> (V, C) voxel rows."""
    return _take0(dense, tables.vox_slot)


def occupancy(tables: BlockTables, valid: jnp.ndarray) -> jnp.ndarray:
    """(B*edge^3,) bool occupied-cell mask from the voxel validity mask."""
    n_dense = tables.num_blocks * tables.edge ** 3
    slot = jnp.where((tables.vox_slot < 0) | ~valid, n_dense, tables.vox_slot)
    return jnp.zeros((n_dense + 1,), bool).at[slot].set(
        True, mode="drop")[:n_dense]


def halo_pad(blocks: jnp.ndarray, block_nbr: jnp.ndarray,
             halo: int) -> jnp.ndarray:
    """(B, E, E, E, C) -> (B, E+2h, E+2h, E+2h, C) with face-neighbor halos.

    Axis-sequential: pad z from z-neighbors' core, then y from the
    *z-padded* y-neighbors (bringing their z-halos along, which fills the
    yz edges), then x from the *yz-padded* x-neighbors (fills xy/xz edges
    and corners).  Missing neighbors (-1) contribute zeros = absent voxels.
    """
    h = halo
    nxm, nxp, nym, nyp, nzm, nzp = (block_nbr[i] for i in range(6))

    zm = _take0(blocks[:, :, :, -h:, :], nzm)        # neighbor's high-z slab
    zp = _take0(blocks[:, :, :, :h, :], nzp)
    p = jnp.concatenate([zm, blocks, zp], axis=3)    # (B, E, E, E+2h, C)

    ym = _take0(p[:, :, -h:, :, :], nym)
    yp = _take0(p[:, :, :h, :, :], nyp)
    p = jnp.concatenate([ym, p, yp], axis=2)         # (B, E, E+2h, E+2h, C)

    xm = _take0(p[:, -h:, :, :, :], nxm)
    xp = _take0(p[:, :h, :, :, :], nxp)
    return jnp.concatenate([xm, p, xp], axis=1)


def dense_subm_conv(dense_flat: jnp.ndarray, occ: jnp.ndarray,
                    tables: BlockTables,
                    weights: jnp.ndarray) -> jnp.ndarray:
    """Submanifold conv on flat dense rows.

    Args:
        dense_flat: (B*edge^3, Cin) flat block-dense features.
        occ: (B*edge^3,) bool occupied-cell mask.
        tables: block layout (face-neighbor table for the halo exchange).
        weights: (k^3, Cin, Cout) in the canonical ``kernel_offsets`` order
            — ``itertools.product`` over (dx, dy, dz), x slowest — which is
            exactly a (k, k, k, Cin, Cout) reshape with index
            ``[dx+h, dy+h, dz+h]`` matching XLA's cross-correlation.
    Returns:
        (B*edge^3, Cout) flat rows, zero at unoccupied cells.
    """
    n_off, cin, cout = weights.shape
    k = round(n_off ** (1.0 / 3.0))
    assert k ** 3 == n_off, (k, n_off)
    h = (k - 1) // 2
    b, edge = tables.num_blocks, tables.edge

    x = dense_flat.reshape(b, edge, edge, edge, cin)
    padded = halo_pad(x, tables.block_nbr, h)
    w = weights.reshape(k, k, k, cin, cout).astype(dense_flat.dtype)
    out = jax.lax.conv_general_dilated(
        padded, w, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.promote_types(dense_flat.dtype,
                                                 jnp.float32)
        ).astype(dense_flat.dtype)
    out = out.reshape(b * edge ** 3, cout)
    return jnp.where(occ[:, None], out, 0.0)
