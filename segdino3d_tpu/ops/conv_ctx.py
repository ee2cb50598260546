"""Submanifold-conv execution contexts: gather-GEMM vs block-dense.

A context bundles the per-level index tables and validity mask, and
exposes the same three operations to the U-Net modules so the *parameter
tree is identical* for both execution strategies (checkpoints trained on
one path load on the other):

* ``subm(feats, w)`` — submanifold conv with canonical (k^3, Cin, Cout)
  weights;
* ``enter(x)`` / ``exit(x)`` — stage-boundary layout conversion (identity
  for the gather path; sparse<->block-dense scatter/gather for the dense
  path);
* ``valid`` — the row-validity mask in the context's layout (feeds
  MaskedBatchNorm and output masking).

Both are registered pytrees so they pass through ``nn.remat`` /
``jax.checkpoint`` cleanly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from segdino3d_tpu.ops import block_dense as BD
from segdino3d_tpu.ops import sparse_conv as SC


@jax.tree_util.register_pytree_node_class
class GatherCtx:
    """Gather-GEMM execution over a (n_off, V) neighbor table."""

    def __init__(self, nbr: jnp.ndarray, valid: jnp.ndarray):
        self.nbr = nbr
        self.valid = valid

    def subm(self, feats, w):
        return SC.subm_conv(feats, self.nbr, w, self.valid)

    def enter(self, x):
        return x

    def exit(self, x):
        return x

    def tree_flatten(self):
        return (self.nbr, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class CompactStemCtx:
    """Degree-compacted stem execution (``SC.stem_compact_conv``): one
    wide matmul + D slot-gathers + overflow segment-sum, from the host
    plan's compacted tables (``native/sparseplan stem_compact``)."""

    def __init__(self, slots: jnp.ndarray, ov_src: jnp.ndarray,
                 ov_dst: jnp.ndarray, valid: jnp.ndarray):
        self.slots = slots
        self.ov_src = ov_src
        self.ov_dst = ov_dst
        self.valid = valid

    def subm(self, feats, w):
        return SC.stem_compact_conv(feats, w, self.slots, self.ov_src,
                                    self.ov_dst, self.valid)

    def enter(self, x):
        return x

    def exit(self, x):
        return x

    def tree_flatten(self):
        return (self.slots, self.ov_src, self.ov_dst, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class DenseCtx:
    """Block-dense execution: features live as (B*edge^3, C) flat rows."""

    def __init__(self, tables: BD.BlockTables, valid: jnp.ndarray,
                 _occ: jnp.ndarray = None):
        self.tables = tables
        self.vox_valid = valid
        self.valid = BD.occupancy(tables, valid) if _occ is None else _occ

    def subm(self, feats, w):
        return BD.dense_subm_conv(feats, self.valid, self.tables, w)

    def enter(self, x):
        return BD.scatter_to_dense(x, self.tables)

    def exit(self, x):
        return BD.gather_from_dense(x, self.tables)

    def tree_flatten(self):
        return (self.tables, self.vox_valid, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        tables, vox_valid, occ = children
        return cls(tables, vox_valid, _occ=occ)
