"""Sparse 3D convolution engine: kernel maps + gather-GEMM-scatter.

TPU-native replacement for the MinkowskiEngine / spconv CUDA convolutions
used by the reference backbones
(``/root/reference/segdino3d/models/backbone/minkunet.py:135-192`` and
``spconvunet.py:42-80``).  Design:

* A **coordinate pyramid** (``build_conv_plan``) is computed once per forward
  from the level-0 voxel coordinates: each level holds its (key-sorted)
  coordinates plus precomputed neighbor-index tables.  This is the TPU
  equivalent of spconv's ``indice_key`` contract — every conv at a level
  reuses the same kernel map, and the inverse (up) convolutions restore the
  exact coordinate set of the matching down level
  (``spconvunet.py:150-212``).
* Convs are **gather-GEMM-accumulate**: for each kernel offset, gather the
  neighbor features and accumulate ``gathered @ W[offset]``.  Static shapes,
  masked invalid neighbors, MXU-friendly matmuls.

Kernel offset ordering is ``itertools.product(range(k), repeat=3)`` over
(x, y, z) displacements — the canonical order used consistently by conv
weights here; checkpoint converters permute external layouts into this.
"""
from __future__ import annotations

import itertools
from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from segdino3d_tpu.ops import keys as K
from segdino3d_tpu.ops.hashing import CoordHash, build_hash, lookup_hash
from segdino3d_tpu.ops.voxelize import VoxelGrid


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """Centered cube offsets for odd k (submanifold), corner-anchored for
    even k (strided), shape (k^3, 3), canonical (x, y, z) product order."""
    if kernel_size % 2 == 1:
        r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        r = range(kernel_size)
    return np.array(list(itertools.product(r, r, r)), dtype=np.int32)


class Level(NamedTuple):
    """One stride level of the coordinate pyramid (a pytree)."""
    coords_T: jnp.ndarray    # (4, V) int32 SoA in units of this level's stride
    key: jnp.ndarray         # (V,) uint32 packed keys
    valid: jnp.ndarray       # (V,) bool
    hash: CoordHash          # key -> voxel id at this level
    num_voxels: jnp.ndarray  # () int32
    # Links to the next-coarser level (None at the deepest level):
    parent_idx: Optional[jnp.ndarray]   # (V,) int32 index into coarser level
    parent_kpos: Optional[jnp.ndarray]  # (V,) int32 in [0, 8): offset slot in the 2x2x2 block

    @property
    def coords(self) -> jnp.ndarray:
        return self.coords_T.T


def _neighbor_table(level: "Level", offsets: np.ndarray,
                    symmetric: bool = True) -> jnp.ndarray:
    """(n_off, V) int32 indices of ``coords + offset`` at the level
    (offset-major layout), -1 where absent.

    Query keys are built by *uint32 key deltas* (no (V, K, 4) coordinate
    materialization); bit-field wraparound at the packing borders is guarded
    with precomputed per-dimension masks.  With ``symmetric`` (odd centered
    kernels), only the first half of the offsets is looked up; the mirrored
    half is reconstructed by scatter (``nbr[mirror(o), j] = i`` whenever
    ``nbr[o, i] = j``), halving the gather rounds.  In ``itertools.product``
    order ``offsets[n-1-o] == -offsets[o]``.
    """
    n_off = len(offsets)
    v = level.key.shape[0]
    center = n_off // 2
    use_sym = symmetric and n_off % 2 == 1 and np.array_equal(
        offsets[::-1], -offsets)
    max_d = int(np.abs(offsets).max())
    wrap = K.neighbor_wrap_masks(level.coords_T, max_d)
    base_invalid = ~level.valid | (level.key == K.U32_SENTINEL)

    # vectorized query-key construction: one broadcasted add for the key
    # deltas + one small matmul for the per-offset wrap-mask selection
    wrap_items = sorted(wrap.keys())
    wrap_stack = jnp.stack([wrap[k] for k in wrap_items]).astype(jnp.float32)

    def query_keys(offs_subset):
        k_sub = len(offs_subset)
        deltas = np.array(
            [K.key_delta_u32(int(dx), int(dy), int(dz))
             for dx, dy, dz in offs_subset], dtype=np.uint32)
        sel = np.zeros((k_sub, len(wrap_items)), np.float32)
        for oi, (dx, dy, dz) in enumerate(offs_subset):
            for dim, d in ((1, int(dx)), (2, int(dy)), (3, int(dz))):
                while d != 0:  # margins 1..|d| all wrap
                    sel[oi, wrap_items.index((dim, d))] = 1.0
                    d -= np.sign(d)
        qk = level.key[None, :] + jnp.asarray(deltas)[:, None]   # (K', V)
        bad = (jnp.asarray(sel) @ wrap_stack) > 0
        bad = bad | base_invalid[None, :]
        return jnp.where(bad, K.U32_SENTINEL, qk)

    if not use_sym:
        return lookup_hash(level.hash, query_keys(offsets))

    first = lookup_hash(level.hash, query_keys(offsets[:center]))  # (c, V)
    self_idx = jnp.where(level.valid, jnp.arange(v, dtype=jnp.int32), -1)
    # mirror half via transpose-scatter: nbr[o, i] = j  =>  mirror[o, j] = i
    # (flattened to a 1D scatter — 2D advanced-index scatters lower badly)
    row_base = jnp.arange(center, dtype=jnp.int32)[:, None] * (v + 1)
    src = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32)[None, :],
                           (center, v))
    flat_tgt = jnp.where(first >= 0, row_base + first,
                         center * (v + 1)).reshape(-1)
    mirror = jnp.full((center * (v + 1),), -1, jnp.int32).at[flat_tgt].set(
        src.reshape(-1), mode="drop").reshape(center, v + 1)[:, :v]
    # row o of `mirror` = neighbors at -offsets[o] = offsets[n-1-o];
    # flip rows to line up with offsets[center+1:]
    second = mirror[::-1]
    return jnp.concatenate([first, self_idx[None, :], second], axis=0)


def _downsample(level: "Level", v_cap: int):
    """Unique(floor(coords/2)) -> coarser Level + parent links (hash-based,
    first-occurrence voxel order, no sort)."""
    n = level.key.shape[0]
    b, x, y, z = (level.coords_T[0], level.coords_T[1],
                  level.coords_T[2], level.coords_T[3])
    cx, cy, cz = x >> 1, y >> 1, z >> 1
    key = K.pack_columns_u32(b, cx, cy, cz, level.valid)
    fine_idx = jnp.arange(n, dtype=jnp.int32)

    h = build_hash(key, fine_idx, level.valid, capacity=min(v_cap, n))
    winner = lookup_hash(h, key, level.valid)
    is_winner = (winner == fine_idx) & level.valid
    vid = jnp.cumsum(is_winner.astype(jnp.int32)) - 1
    num_coarse = jnp.sum(is_winner.astype(jnp.int32))

    parent = jnp.where(
        winner >= 0, vid[jnp.clip(winner, 0, n - 1)], -1).astype(jnp.int32)
    kpos = (((x & 1) << 2) | ((y & 1) << 1) | (z & 1)).astype(jnp.int32)

    upd = jnp.where(is_winner & (vid < v_cap), vid, v_cap)

    def scat(col, fill=0):
        return jnp.full((v_cap,), fill, col.dtype).at[upd].set(col, mode="drop")

    coarse_coords_T = jnp.stack([scat(b), scat(cx), scat(cy), scat(cz)])
    coarse_key = scat(key, fill=K.U32_SENTINEL)
    c_valid = jnp.arange(v_cap, dtype=jnp.int32) < num_coarse

    remapped = jnp.where(
        h.t_val >= 0, vid[jnp.clip(h.t_val, 0, n - 1)], -1).astype(jnp.int32)
    h = h._replace(t_val=remapped)

    coarse = Level(coords_T=coarse_coords_T, key=coarse_key, valid=c_valid,
                   hash=h, num_voxels=num_coarse,
                   parent_idx=None, parent_kpos=None)
    return coarse, parent, kpos


class ConvPlan(NamedTuple):
    """Coordinate pyramid shared by all convs in a U-Net forward."""
    levels: tuple  # tuple[Level]


def build_conv_plan(grid: VoxelGrid, num_levels: int,
                    level_caps: Optional[Sequence[int]] = None) -> ConvPlan:
    """Build the stride-1..2^(L-1) coordinate pyramid from level-0 voxels."""
    v0 = grid.key.shape[0]
    caps = list(level_caps) if level_caps is not None else [v0] * num_levels
    lvl0 = Level(coords_T=grid.coords_T, key=grid.key, valid=grid.valid,
                 hash=grid.hash, num_voxels=grid.num_voxels,
                 parent_idx=None, parent_kpos=None)
    levels = [lvl0]
    for li in range(1, num_levels):
        coarse, parent, kpos = _downsample(levels[-1], caps[li])
        levels[-1] = levels[-1]._replace(parent_idx=parent, parent_kpos=kpos)
        levels.append(coarse)
    return ConvPlan(levels=tuple(levels))


# ---------------------------------------------------------------------------
# Convolution ops. All take (feats, plan/level data) -> feats.
# ---------------------------------------------------------------------------


def _gather_rows(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows; idx == -1 -> zeros.

    Note: ``mode='fill'`` only fills indices >= n; negative indices wrap, so
    remap -1 to n first.
    """
    idx = jnp.where(idx < 0, feats.shape[0], idx)
    return jnp.take(feats, idx, axis=0, mode="fill", fill_value=0)


def subm_conv(feats: jnp.ndarray, nbr: jnp.ndarray, weights: jnp.ndarray,
              valid: jnp.ndarray, target_elems: int = 6_000_000) -> jnp.ndarray:
    """Submanifold convolution: output coords == input coords.

    Chunked gather-im2col-GEMM: voxels are processed in chunks; per chunk
    one batched row-gather builds the (chunk, n_off*Cin) im2col patch and a
    single MXU matmul with the flattened (n_off*Cin, Cout) kernel applies
    the conv.  Large K keeps the MXU efficient (12+ TFLOPs vs ~4 for C=96
    square matmuls on v5e) and the serial depth is n_chunks, not n_offsets.
    ``target_elems`` bounds the transient im2col buffer.

    Differentiation goes through a custom VJP (scatter-free backward via
    the submanifold mirror symmetry — see ``_subm_conv_bwd``); odd
    centered kernels only, which is all a *submanifold* conv can be.

    Args:
        feats: (V, Cin).
        nbr: (n_off, V) offset-major neighbor table for this level & kernel.
        weights: (n_off, Cin, Cout).
        valid: (V,) bool.
    """
    assert weights.shape[0] % 2 == 1, "submanifold kernels are odd/centered"
    return _subm_conv_cd(feats, nbr, weights, valid, target_elems)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _subm_conv_cd(feats, nbr, weights, valid, target_elems):
    return _subm_conv_impl(feats, nbr, weights, valid, target_elems)


def _subm_conv_impl(feats: jnp.ndarray, nbr: jnp.ndarray,
                    weights: jnp.ndarray, valid: jnp.ndarray,
                    target_elems: int = 6_000_000) -> jnp.ndarray:
    v = feats.shape[0]
    n_off, cin, cout = weights.shape

    if cin > 2 * cout:
        # matmul-first: out[i] = sum_o (X @ W[o])[nbr[o,i]] — gathers rows
        # of width Cout instead of Cin. For the 259->32 k5 stem this cuts
        # gather traffic ~8x (row selection commutes with the matmul).
        # Offsets are grouped so each scan-step matmul has N ~= 256 output
        # columns (full MXU lane utilization instead of N=Cout; 256 beat
        # 128 by ~0.8 ms on the v5e k5 stem — tools/stem_bench.py g8).
        g = max(1, 256 // cout)
        n_full = n_off // g
        rem = n_off - n_full * g  # peeled: padding offsets would cost
        # full-width gathers (0.12 ms per 78k rows on v5e — 3 dead
        # gathers for the 125->128 k5 pad)
        # (n_full, cin, g*cout): group weights concatenated along N
        w_grp = weights[:n_full * g].reshape(n_full, g, cin, cout) \
            .transpose(0, 2, 1, 3).reshape(n_full, cin, g * cout) \
            .astype(feats.dtype)
        nbr_grp = nbr[:n_full * g].reshape(n_full, g, v)
        out0 = jnp.zeros((v, cout), feats.dtype)

        def _apply_group(acc, w_g, nbr_g, width):
            y = jnp.dot(feats, w_g,
                        preferred_element_type=jnp.float32).astype(feats.dtype)
            for j in range(width):
                acc = acc + _gather_rows(
                    y[:, j * cout:(j + 1) * cout], nbr_g[j])
            return acc

        def body(acc, xs):
            w_g, nbr_g = xs
            return _apply_group(acc, w_g, nbr_g, g), None

        out, _ = jax.lax.scan(body, out0, (w_grp, nbr_grp))
        if rem:
            w_r = weights[n_full * g:].transpose(1, 0, 2) \
                .reshape(cin, rem * cout).astype(feats.dtype)
            out = _apply_group(out, w_r, nbr[n_full * g:], rem)
        return jnp.where(valid[:, None], out, 0.0)

    # gather-im2col-GEMM path (Cin ~ Cout): big-K MXU matmuls
    k_dim = n_off * cin
    chunk = max(256, min(v, 1 << max(8, (target_elems // max(k_dim, 1))
                                     .bit_length() - 1)))
    n_chunks = -(-v // chunk)
    v_pad = n_chunks * chunk
    nbr_p = jnp.concatenate(
        [nbr, jnp.full((n_off, v_pad - v), -1, jnp.int32)], axis=1) \
        if v_pad != v else nbr
    wmat = weights.reshape(k_dim, cout).astype(feats.dtype)

    def body(_, chunk_nbr):
        # chunk_nbr: (n_off, chunk) -> per-voxel-contiguous index order
        g = _gather_rows(feats, chunk_nbr.T.reshape(-1))
        g = g.reshape(chunk, k_dim)
        o = jnp.dot(g, wmat, preferred_element_type=jnp.float32)
        return None, o.astype(feats.dtype)

    xs = nbr_p.reshape(n_off, n_chunks, chunk).transpose(1, 0, 2)
    _, outs = jax.lax.scan(body, None, xs)
    out = outs.reshape(v_pad, cout)[:v]
    return jnp.where(valid[:, None], out, 0.0)


def _subm_conv_fwd(feats, nbr, weights, valid, target_elems):
    out = _subm_conv_impl(feats, nbr, weights, valid, target_elems)
    return out, (feats, nbr, weights, valid)


def _subm_conv_bwd(target_elems, res, dout):
    """Scatter-free backward via the submanifold mirror symmetry.

    For odd centered kernels in canonical product order,
    ``offsets[n-1-o] == -offsets[o]``, so valid pairs biject:
    ``nbr[o, j] == i  <=>  nbr[n-1-o, i] == j``.  Rewriting the autodiff
    scatter-adds through that bijection:

    * ``dX[i] = sum_o' dY[nbr[o', i]] @ W[n-1-o']^T`` — the backward is
      itself a gather-conv with offset-flipped, transposed weights;
    * ``dW[n-1-o'] = X^T @ gather(dY, nbr[o'])`` — the same gathered rows
      feed the weight gradient.

    One fused chunk loop therefore computes both grads from a single
    row-gather of ``dY`` (width Cout — for the wide-input stem this is
    8x narrower than what autodiff scatters), two MXU GEMMs per chunk,
    and **no scatter at all**.  It also recomputes the im2col patches
    instead of saving them, so nothing scan-carried from the forward is
    kept alive (autodiff retains the stacked (V, n_off*Cin) patches —
    hundreds of MB per layer at production sizes).
    """
    feats, nbr, weights, valid = res
    n_off, cin, cout = weights.shape
    v = feats.shape[0]
    dy = jnp.where(valid[:, None], dout, 0).astype(feats.dtype)
    # W[mirror(o')]^T blocks, flattened K-major to pair with the dY im2col
    w_bwd = jnp.flip(weights, axis=0).transpose(0, 2, 1) \
        .reshape(n_off * cout, cin).astype(feats.dtype)

    k_dim = n_off * cout
    chunk = max(256, min(v, 1 << max(8, (target_elems // max(k_dim, 1))
                                     .bit_length() - 1)))
    n_chunks = -(-v // chunk)
    v_pad = n_chunks * chunk
    nbr_p = jnp.concatenate(
        [nbr, jnp.full((n_off, v_pad - v), -1, jnp.int32)], axis=1) \
        if v_pad != v else nbr
    feats_p = jnp.concatenate(
        [feats, jnp.zeros((v_pad - v, cin), feats.dtype)]) \
        if v_pad != v else feats

    def body(dw_acc, xs):
        chunk_nbr, x_c = xs                      # (n_off, chunk), (chunk, cin)
        g = _gather_rows(dy, chunk_nbr.T.reshape(-1)).reshape(chunk, k_dim)
        dx_c = jnp.dot(g, w_bwd, preferred_element_type=jnp.float32)
        dw_acc = dw_acc + jnp.dot(x_c.T, g,
                                  preferred_element_type=jnp.float32)
        return dw_acc, dx_c.astype(feats.dtype)

    xs = (nbr_p.reshape(n_off, n_chunks, chunk).transpose(1, 0, 2),
          feats_p.reshape(n_chunks, chunk, cin))
    dw_flat, dx_chunks = jax.lax.scan(
        body, jnp.zeros((cin, k_dim), jnp.float32), xs)
    dx = dx_chunks.reshape(v_pad, cin)[:v]
    # dw_flat column-block o' holds dW[mirror(o')] -> flip back to natural
    dw = jnp.flip(dw_flat.reshape(cin, n_off, cout).transpose(1, 0, 2),
                  axis=0).astype(weights.dtype)
    f0 = jax.dtypes.float0
    return (dx, np.zeros(nbr.shape, f0), dw, np.zeros(valid.shape, f0))


_subm_conv_cd.defvjp(_subm_conv_fwd, _subm_conv_bwd)


def stem_compact_conv(feats: jnp.ndarray, weights: jnp.ndarray,
                      slots: jnp.ndarray, ov_src: jnp.ndarray,
                      ov_dst: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Degree-compacted submanifold conv (the k5 early-fusion stem).

    Rewrites the gather-GEMM stem around two measured v5e facts: XLA TPU
    row-gathers cost ~2 ns/row *independent of row width and source-buffer
    size* (tools/gather_probe.py), and on 2-manifold scenes only ~22% of
    the 125 stem offsets hit an occupied voxel (avg degree ~28).  So
    instead of 125 per-offset gathers:

    1. ONE matmul ``y = X @ W_flat`` with ``W_flat = (Cin, n_off*Cout)``
       laid out so ``y.reshape(V*n_off, Cout)`` puts (voxel j, offset o)
       at flat row ``j*n_off + o`` — contiguous, nothing for XLA to fuse
       into the gathers;
    2. ``D`` row-gathers over the host-compacted slot table
       (``native/sparseplan stem_compact``): ``out[i] = Σ_d y2[slots[d,i]]``;
    3. overflow pairs beyond D per voxel via one gather + segment-sum.

    Measured: 34.5 ms -> ~10 ms on the 120k-pt bench scene (D=32).
    Inference path (training uses the dense stem); differentiation falls
    back to autodiff scatter-adds — correct but slow, by design unused.

    Args:
        feats: (V, Cin).  weights: (n_off, Cin, Cout) canonical order.
        slots: (D, V) int32 flat indices ``nbr*n_off+o``, -1 empty.
        ov_src: (P,) int32 flat indices, -1 padding.
        ov_dst: (P,) int32 destination voxel ids, V (dump row) padding.
        valid: (V,) bool.
    """
    v = feats.shape[0]
    n_off, cin, cout = weights.shape
    w_flat = weights.transpose(1, 0, 2).reshape(cin, n_off * cout) \
        .astype(feats.dtype)
    y = jnp.dot(feats, w_flat,
                preferred_element_type=jnp.float32).astype(feats.dtype)
    y2 = y.reshape(v * n_off, cout)

    def body(acc, slot_row):
        return acc + _gather_rows(y2, slot_row), None

    acc, _ = jax.lax.scan(body, jnp.zeros((v, cout), feats.dtype), slots)
    rows = _gather_rows(y2, ov_src)
    acc = acc + jax.ops.segment_sum(rows, ov_dst, num_segments=v + 1)[:v]
    return jnp.where(valid[:, None], acc, 0.0)


def down_conv(feats: jnp.ndarray, fine: Level, coarse: Level,
              weights: jnp.ndarray) -> jnp.ndarray:
    """Strided conv k=2 s=2: coarse[j] = sum_k W[k] fine[2j + off_k].

    Uses the cached parent links: equivalent gather form via scatter —
    each fine voxel contributes to exactly one coarse voxel with one kernel
    slot, so we accumulate per-offset masked matmuls scattered by parent.
    weights: (8, Cin, Cout).
    """
    cout = weights.shape[2]
    v_coarse = coarse.coords.shape[0]
    parent = jnp.where(fine.valid, fine.parent_idx, v_coarse)
    # per-voxel weight select via scan over the 8 kernel slots, then one
    # scatter-add by parent
    contrib0 = jnp.zeros((feats.shape[0], cout), feats.dtype)

    def body(acc, xs):
        o, w_o = xs
        sel = (fine.parent_kpos == o) & fine.valid
        c = jnp.dot(feats * sel[:, None].astype(feats.dtype), w_o,
                    preferred_element_type=feats.dtype)
        return acc + jnp.where(sel[:, None], c, 0.0), None

    contrib, _ = jax.lax.scan(
        body, contrib0,
        (jnp.arange(8, dtype=jnp.int32), weights.astype(feats.dtype)))
    out = jax.ops.segment_sum(contrib, parent,
                              num_segments=v_coarse + 1)[:v_coarse]
    return jnp.where(coarse.valid[:, None], out, 0.0)


def up_conv(feats: jnp.ndarray, fine: Level, weights: jnp.ndarray) -> jnp.ndarray:
    """Inverse / transpose conv k=2 s=2 restoring the fine coordinate set.

    ``fine.parent_idx/parent_kpos`` give, for every fine voxel, its unique
    coarse source and kernel slot — the exact transpose of ``down_conv``
    (the ``indice_key`` contract, ``spconvunet.py:184-201``).
    weights: (8, Cin, Cout).
    """
    gathered = _gather_rows(feats, jnp.where(fine.valid, fine.parent_idx, -1))
    cout = weights.shape[2]
    out0 = jnp.zeros((fine.coords.shape[0], cout), feats.dtype)

    def body(acc, xs):
        o, w_o = xs
        sel = (fine.parent_kpos == o) & fine.valid
        c = jnp.dot(gathered, w_o, preferred_element_type=feats.dtype)
        return acc + jnp.where(sel[:, None], c, 0.0), None

    out, _ = jax.lax.scan(
        body, out0,
        (jnp.arange(8, dtype=jnp.int32), weights.astype(feats.dtype)))
    return out


def conv1x1(feats: jnp.ndarray, weight: jnp.ndarray, valid: jnp.ndarray,
            stride2_fine: Optional[Level] = None,
            coarse_valid: Optional[jnp.ndarray] = None,
            v_coarse: Optional[int] = None) -> jnp.ndarray:
    """1x1(x1) conv; with stride2_fine set, behaves as k=1 s=2 (projection
    shortcut in Res16UNet downsample, picking the kernel-center sample).

    ME's k=1 s=2 conv maps each coarse output to the *single* input at
    exactly 2x its coordinate (if present).
    """
    if stride2_fine is None:
        out = jnp.dot(feats, weight, preferred_element_type=feats.dtype)
        return jnp.where(valid[:, None], out, 0.0)
    # k=1 stride=2: coarse[j] <- fine voxel whose coords == 2*coarse coords,
    # i.e. the fine child with kpos == 0 of parent j.
    sel = (stride2_fine.parent_kpos == 0) & stride2_fine.valid
    parent = jnp.where(sel, stride2_fine.parent_idx, v_coarse)
    scattered = jax.ops.segment_sum(
        jnp.where(sel[:, None], feats, 0.0), parent,
        num_segments=v_coarse + 1)[:v_coarse]
    out = jnp.dot(scattered, weight, preferred_element_type=feats.dtype)
    return jnp.where(coarse_valid[:, None], out, 0.0)
