"""Block-dense submanifold convolution: sparse voxels as dense MXU tiles.

The gather-GEMM path (``ops.sparse_conv.subm_conv``) is gather-latency
bound on TPU: every k3 conv issues 27 per-voxel row gathers.  This module
instead packs voxels into axis-aligned ``edge``^3 blocks (host plan:
``native/sparseplan`` ``block_assign``) and runs each conv as a real dense
3D convolution on the MXU:

1. **scatter once per stage**: voxel rows -> flat dense rows
   ``(n_blocks * edge^3, C)`` via the per-voxel ``vox_slot`` table;
2. **halo exchange per conv**: pad each block with the boundary slabs of
   its full 3x3x3 neighbor shell (26 block-slab gathers; each direction
   reads the neighbor's core directly, so absent face blocks never mask
   present diagonal blocks);
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

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


# rows of the (26, B) shell-neighbor table: itertools.product(-1,0,1)^3
# order with the center skipped; face directions land at these rows
FACE_XM, FACE_YM, FACE_ZM, FACE_ZP, FACE_YP, FACE_XP = 4, 10, 12, 13, 15, 21


@jax.tree_util.register_pytree_node_class
class BlockTables:
    """Per-level block-dense layout tables.

    A registered pytree whose ``edge`` rides in the treedef (static under
    jit), so the plan alone determines the dense layout."""

    def __init__(self, vox_slot: jnp.ndarray, block_nbr: jnp.ndarray,
                 edge: int, slot_vox: Optional[jnp.ndarray] = None):
        self.vox_slot = vox_slot    # (V,) int32 block*edge^3 + local, -1 inv.
        self.block_nbr = block_nbr  # (26, B) int32 3x3x3-shell neighbors
        self.edge = edge
        # (B*edge^3,) int32 dense slot -> voxel id (-1 empty): the inverse
        # of vox_slot.  When present, gather_from_dense's VJP runs as the
        # mirror gather instead of a scatter-add (scatter-free training
        # backward; see gather_from_dense).
        self.slot_vox = slot_vox

    @property
    def num_blocks(self) -> int:
        return self.block_nbr.shape[1]

    def tree_flatten(self):
        return (self.vox_slot, self.block_nbr, self.slot_vox), self.edge

    @classmethod
    def tree_unflatten(cls, edge, children):
        return cls(children[0], children[1], edge, children[2])


def _take0(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along axis 0 with -1 -> zeros (mode='fill' only handles
    overflow, so remap negatives past the end first)."""
    idx = jnp.where(idx < 0, arr.shape[0], idx)
    return jnp.take(arr, idx, axis=0, mode="fill", fill_value=0)


def scatter_to_dense(feats: jnp.ndarray, tables: BlockTables) -> jnp.ndarray:
    """(V, C) voxel rows -> (B*edge^3, C) flat dense rows.

    Invalid slots (-1) remap past the end and ``mode='drop'`` discards
    them — no dump row, so no extra full-size slice copy.  Measured
    (r4): a gather formulation through the inverse table (``dense[j] =
    feats[slot_vox[j]]``) ran ~7 ms/step SLOWER end-to-end — XLA's
    unique-index scatter stores only the V occupied rows, while the
    gather pays row-rate on every dense cell — so the forward stays a
    scatter (its autodiff backward is already a gather)."""
    n_dense = tables.num_blocks * tables.edge ** 3
    slot = jnp.where(tables.vox_slot < 0, n_dense, tables.vox_slot)
    return jnp.zeros((n_dense, feats.shape[1]), feats.dtype) \
        .at[slot].set(feats, mode="drop")


def gather_from_dense(dense: jnp.ndarray, tables: BlockTables) -> jnp.ndarray:
    """(B*edge^3, C) flat dense rows -> (V, C) voxel rows.

    Forward is a plain row-gather either way; with the plan's inverse
    table (``slot_vox``) the VJP is the mirror gather through the slot
    bijection (``d_dense[j] = g[slot_vox[j]]``) instead of autodiff's
    scatter-add — scatter-free training backward, identical inference."""
    if tables.slot_vox is not None:
        return _bijection_take(dense, tables.vox_slot, tables.slot_vox)
    return _take0(dense, tables.vox_slot)


@jax.custom_vjp
def _bijection_take(x: jnp.ndarray, idx: jnp.ndarray,
                    inv_idx: jnp.ndarray) -> jnp.ndarray:
    """``out[j] = x[idx[j]]`` (fill 0 at idx<0) where ``idx`` is injective
    on its non-negative entries and ``inv_idx`` is its inverse
    (``inv_idx[i] = j iff idx[j] = i``, else -1).  The transpose of an
    injective gather is the inverse gather: ``dx[i] = g[inv_idx[i]]``."""
    return _take0(x, idx)


def _bijection_take_fwd(x, idx, inv_idx):
    return _take0(x, idx), (idx, inv_idx)


def _bijection_take_bwd(res, g):
    idx, inv_idx = res
    f0 = jax.dtypes.float0
    return (_take0(g, inv_idx), np.zeros(idx.shape, f0),
            np.zeros(inv_idx.shape, f0))


_bijection_take.defvjp(_bijection_take_fwd, _bijection_take_bwd)


def occupancy(tables: BlockTables, valid: jnp.ndarray) -> jnp.ndarray:
    """(B*edge^3,) bool occupied-cell mask from the voxel validity mask."""
    if tables.slot_vox is not None:
        # host-built tables: the C++ block_assign writes vox_slot = -1 for
        # every voxel past the level's valid count (sparseplan.cpp
        # block_assign tail loop), so slot_vox only references valid
        # voxels and the mask is elementwise — no scatter (~0.5 ms/step
        # at L0 e4 saved)
        return tables.slot_vox >= 0
    n_dense = tables.num_blocks * tables.edge ** 3
    slot = jnp.where((tables.vox_slot < 0) | ~valid, n_dense, tables.vox_slot)
    return jnp.zeros((n_dense,), bool).at[slot].set(True, mode="drop")


def _shell_dirs():
    import itertools as _it

    return [d for d in _it.product((-1, 0, 1), repeat=3) if d != (0, 0, 0)]


def halo_pad(blocks: jnp.ndarray, block_nbr: jnp.ndarray,
             halo: int) -> jnp.ndarray:
    """(B, E, E, E, C) -> (B, E+2h, E+2h, E+2h, C) with 26-neighbor halos.

    Every shell direction gathers its own slab from the neighbor's CORE
    (the +x neighbor fills the high-x halo with its low-x cells, the
    (+y,+z) edge neighbor fills that edge with its low-y/low-z cells,
    ...).  Missing neighbors (-1) contribute zeros = absent voxels.

    An axis-sequential 6-face exchange (z, then y-with-z-halo, then x) is
    NOT equivalent: it routes edge/corner halos through the face
    neighbors' halos, which silently zeroes a present diagonal block
    whenever the intermediate face block is unoccupied — common on real
    surface geometry at small edges (caught by the e4 L0 parity test).

    Differentiation goes through a custom VJP: the neighbor relation is
    involutive (``nbr_d[i] = j  <=>  nbr_{-d}[j] = i``), so the backward
    is a mirrored halo-GATHER of the cotangent's shell regions plus
    static-slice adds — autodiff would instead emit 26 row scatter-adds
    per conv layer (see ``_halo_pad_bwd``).
    """
    return _halo_pad_cd(blocks, block_nbr, halo)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _halo_pad_cd(blocks, block_nbr, halo):
    return _halo_pad_impl(blocks, block_nbr, halo)


def _halo_pad_impl(blocks, block_nbr, halo):
    h = halo
    b, e, c = blocks.shape[0], blocks.shape[1], blocks.shape[-1]
    sl = {-1: slice(e - h, e), 0: slice(0, e), 1: slice(0, h)}
    shell = _shell_dirs()
    parts = {(0, 0, 0): blocks}
    for di, d in enumerate(shell):
        slab = blocks[:, sl[d[0]], sl[d[1]], sl[d[2]], :].reshape(b, -1)
        ext = (h if d[0] else e, h if d[1] else e, h if d[2] else e)
        parts[d] = _take0(slab, block_nbr[di]).reshape(b, *ext, c)
    xs = []
    for dx in (-1, 0, 1):
        ys = []
        for dy in (-1, 0, 1):
            ys.append(jnp.concatenate([parts[(dx, dy, dz)]
                                       for dz in (-1, 0, 1)], axis=3))
        xs.append(jnp.concatenate(ys, axis=2))
    return jnp.concatenate(xs, axis=1)


def _halo_pad_fwd(blocks, block_nbr, halo):
    return (_halo_pad_impl(blocks, block_nbr, halo),
            (block_nbr, blocks.shape))


def _halo_pad_bwd(halo, res, dp):
    """Scatter-free halo backward.

    Forward copied ``blocks[nbr_d[i]]``'s d-slab into i's d-halo; the
    cotangent flows back as ``d_blocks[j].slab(d) += d_shell_region(d)
    [nbr_{-d}[j]]`` — a gather with the MIRRORED neighbor row (the shell
    list in product order mirrors by index reversal: shell[25-i] ==
    -shell[i]), landing on a static sub-slice of the core.  26 gathers +
    static-slice adds replace autodiff's 26 row scatter-adds.
    """
    block_nbr, shape = res
    h = halo
    b, e, c = shape[0], shape[1], shape[-1]
    # region of direction d inside the padded tensor / inside the core
    psl = {-1: slice(0, h), 0: slice(h, e + h), 1: slice(e + h, e + 2 * h)}
    sl = {-1: slice(e - h, e), 0: slice(0, e), 1: slice(0, h)}
    shell = _shell_dirs()
    dblocks = dp[:, h:e + h, h:e + h, h:e + h, :]
    for di, d in enumerate(shell):
        region = dp[:, psl[d[0]], psl[d[1]], psl[d[2]], :]
        contrib = _take0(region.reshape(b, -1), block_nbr[25 - di])
        dblocks = dblocks.at[:, sl[d[0]], sl[d[1]], sl[d[2]], :].add(
            contrib.reshape(region.shape))
    return dblocks, np.zeros(block_nbr.shape, jax.dtypes.float0)


_halo_pad_cd.defvjp(_halo_pad_fwd, _halo_pad_bwd)


# transient halo-padded buffer budget before the conv chunks over blocks.
# 1 GiB keeps single-scene (batch 1) convs unchunked on a 16 GiB chip;
# large batches should lower it (bench.py exports 384 MiB at batch >= 4).
_CHUNK_BUDGET_BYTES = int(
    float(__import__("os").environ.get("SEGDINO_CONV_CHUNK_MB", "1024"))
    * 2 ** 20)


def _conv_valid(padded, weights, k, cin, cout, out_dtype):
    w = weights.reshape(k, k, k, cin, cout).astype(padded.dtype)
    # bf16 operands keep a bf16 output type: the TPU MXU accumulates in
    # f32 internally regardless, and a promoted preferred_element_type
    # breaks differentiation (the conv transpose rule would pair an f32
    # cotangent with bf16 kernels — lax.conv is strict about dtypes)
    pref = (jnp.float32 if padded.dtype == jnp.float32
            else padded.dtype)
    return jax.lax.conv_general_dilated(
        padded, w, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=pref).astype(out_dtype)


def dense_subm_conv(dense_flat: jnp.ndarray, occ: jnp.ndarray,
                    tables: BlockTables,
                    weights: jnp.ndarray) -> jnp.ndarray:
    """Submanifold conv on flat dense rows.

    Large inputs are processed in block chunks (``lax.map``): per chunk
    the 3x3x3 neighbor-block shell is gathered as whole contiguous blocks
    and the halo-padded tile assembled from static slices, bounding the
    transient padded buffer to ``SEGDINO_CONV_CHUNK_MB`` regardless of
    scene size/batch.

    Args:
        dense_flat: (B*edge^3, Cin) flat block-dense features.
        occ: (B*edge^3,) bool occupied-cell mask.
        tables: block layout (shell-neighbor table for the halo exchange).
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
    assert h <= tables.edge, (k, tables.edge)
    b, edge = tables.num_blocks, tables.edge

    padded_bytes = (b * (edge + 2 * h) ** 3 * cin
                    * dense_flat.dtype.itemsize)
    if padded_bytes > _CHUNK_BUDGET_BYTES and cin >= 96:
        # conv is linear over input channels: splitting wide-Cin convs
        # (the 259-channel early-fusion stem) halves every Cin-sized
        # temporary while keeping the fast sequential-halo path — exact,
        # and much cheaper than chunking over blocks
        half = cin // 2
        lo = dense_subm_conv(dense_flat[:, :half], occ, tables,
                             weights[:, :half, :])
        hi = dense_subm_conv(dense_flat[:, half:], occ, tables,
                             weights[:, half:, :])
        return lo + hi

    padded_block_bytes = (edge + 2 * h) ** 3 * cin * dense_flat.dtype.itemsize
    chunk = max(64, _CHUNK_BUDGET_BYTES // max(padded_block_bytes, 1))
    if chunk >= b:
        x = dense_flat.reshape(b, edge, edge, edge, cin)
        padded = halo_pad(x, tables.block_nbr, h)
        out = _conv_valid(padded, weights, k, cin, cout, dense_flat.dtype)
        out = out.reshape(b * edge ** 3, cout)
        return jnp.where(occ[:, None], out, 0.0)
    return _chunked_conv(dense_flat, occ, tables, weights, k, h, chunk)


def _chunked_conv(dense_flat, occ, tables, weights, k, h, chunk):
    return _chunked_conv_cd(dense_flat, occ, weights, tables.block_nbr,
                            tables.edge, k, chunk)


def _chunk_ids(block_nbr, b, chunk):
    """Chunk-padded self/neighbor id tables: (n_chunks, chunk) and
    (n_chunks, 26, chunk); padding ids are -1 (gather as zeros)."""
    n_chunks = -(-b // chunk)
    b_pad = n_chunks * chunk

    def padb(x):
        return jnp.concatenate(
            [x, jnp.full((x.shape[0], b_pad - x.shape[1]), -1, jnp.int32)],
            axis=1) if b_pad != b else x

    self_ids = padb(jnp.arange(b, dtype=jnp.int32)[None])[0]
    nbr = padb(block_nbr)
    return (self_ids.reshape(n_chunks, chunk),
            nbr.reshape(26, n_chunks, chunk).transpose(1, 0, 2))


def _assemble_padded(x_rows, b, ids_self, ids_nbr, edge, h, chunk):
    """Halo-padded (chunk, E+2h, E+2h, E+2h, C) tile for one block chunk,
    gathering exactly the slab each shell direction contributes.
    ``x_rows`` is (b*edge^3, C) flat dense rows."""
    c = x_rows.shape[-1]
    sl = {-1: slice(edge - h, edge), 0: slice(0, edge), 1: slice(0, h)}
    shell = _shell_dirs()
    core5 = x_rows.reshape(b, edge, edge, edge, c)
    core = x_rows.reshape(b, edge ** 3 * c)
    parts = {(0, 0, 0): _take0(core, ids_self)
             .reshape(chunk, edge, edge, edge, c)}
    for di, d in enumerate(shell):
        slab = core5[:, sl[d[0]], sl[d[1]], sl[d[2]], :].reshape(b, -1)
        ext = (h if d[0] else edge, h if d[1] else edge, h if d[2] else edge)
        parts[d] = _take0(slab, ids_nbr[di]).reshape(chunk, *ext, c)
    xs = []
    for dx in (-1, 0, 1):
        ys = []
        for dy in (-1, 0, 1):
            ys.append(jnp.concatenate([parts[(dx, dy, dz)]
                                       for dz in (-1, 0, 1)], axis=3))
        xs.append(jnp.concatenate(ys, axis=2))
    return jnp.concatenate(xs, axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _chunked_conv_cd(dense_flat, occ, weights, block_nbr, edge, k, chunk):
    """Chunked conv: gather exactly the halo slabs each shell direction
    contributes, so traffic stays ~2-3x the core instead of 27 full
    neighbor blocks.  Custom VJP (below) keeps the backward scatter-free
    too — autodiff through the slab gathers would emit 26 row
    scatter-adds per chunk."""
    return _chunked_conv_impl(dense_flat, occ, weights, block_nbr,
                              edge, k, chunk)


def _chunked_conv_impl(dense_flat, occ, weights, block_nbr, edge, k, chunk):
    n_off, cin, cout = weights.shape
    h = (k - 1) // 2
    b = block_nbr.shape[1]
    e3 = edge ** 3
    ids_self, ids_nbr = _chunk_ids(block_nbr, b, chunk)
    b_pad = ids_self.shape[0] * chunk

    def one_chunk(args):
        padded = _assemble_padded(dense_flat, b, args[0], args[1],
                                  edge, h, chunk)
        out = _conv_valid(padded, weights, k, cin, cout, dense_flat.dtype)
        return out.reshape(chunk * e3, cout)

    outs = jax.lax.map(one_chunk, (ids_self, ids_nbr))
    out = outs.reshape(b_pad * e3, cout)[:b * e3]
    if occ is None:
        return out
    return jnp.where(occ[:, None], out, 0.0)


def _chunked_conv_fwd(dense_flat, occ, weights, block_nbr, edge, k, chunk):
    out = _chunked_conv_impl(dense_flat, occ, weights, block_nbr,
                             edge, k, chunk)
    return out, (dense_flat, occ, weights, block_nbr)


def _chunked_conv_bwd(edge, k, chunk, res, dp):
    """Scatter-free chunked backward via the same mirror symmetry as
    ``_halo_pad_bwd``: the forward is ``out = M_occ · C · x`` with ``C``
    the block-halo cross-correlation, whose adjacency is involutive
    (``nbr_d[i] = j <=> nbr_{-d}[j] = i``), so ``C^T`` is the SAME
    chunked conv with offset-flipped, channel-transposed weights:
    ``d_x = C^T(M_occ dp)`` — no scatter-adds.  ``dW`` accumulates per
    chunk through the dense conv's own weight-VJP under ``lax.scan``."""
    dense_flat, occ, weights, block_nbr = res
    n_off, cin, cout = weights.shape
    h = (k - 1) // 2
    b = block_nbr.shape[1]
    e3 = edge ** 3
    dpm = dp if occ is None else jnp.where(occ[:, None], dp, 0)

    w_t = weights[::-1].transpose(0, 2, 1)       # flip offsets, swap io
    d_dense = _chunked_conv_impl(dpm, None, w_t, block_nbr, edge, k, chunk)

    ids_self, ids_nbr = _chunk_ids(block_nbr, b, chunk)

    def dw_chunk(acc, args):
        ids_s, ids_n = args
        padded = _assemble_padded(dense_flat, b, ids_s, ids_n,
                                  edge, h, chunk)
        dpc = _take0(dpm.reshape(b, e3 * cout), ids_s).reshape(
            chunk, edge, edge, edge, cout)
        _, vjp = jax.vjp(
            lambda w: _conv_valid(padded, w, k, cin, cout, dpc.dtype),
            weights)
        return acc + vjp(dpc)[0].astype(jnp.float32), None

    dw, _ = jax.lax.scan(dw_chunk,
                         jnp.zeros(weights.shape, jnp.float32),
                         (ids_self, ids_nbr))
    occ_ct = (None if occ is None
              else np.zeros(occ.shape, jax.dtypes.float0))
    return (d_dense, occ_ct, dw.astype(weights.dtype),
            np.zeros(block_nbr.shape, jax.dtypes.float0))


_chunked_conv_cd.defvjp(_chunked_conv_fwd, _chunked_conv_bwd)
