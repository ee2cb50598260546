"""Segment reductions over ragged integer indices (static shapes).

TPU-native replacement for ``torch_scatter.scatter_mean`` used throughout
the reference (superpoint feature pooling at
``/root/reference/segdino3d/models/backbone/minkunet.py:639``, GT mask
pooling at ``segdino3d/datasets/dataset/scannet200.py:246-250``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(x: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                valid=None) -> jnp.ndarray:
    """Sum of rows of ``x`` grouped by ``seg_ids``; invalid rows dropped.

    ``seg_ids`` outside [0, num_segments) are dumped into an extra slot and
    discarded, so callers can use ``num_segments`` as the padding sentinel.
    """
    if valid is not None:
        seg_ids = jnp.where(valid, seg_ids, num_segments)
    seg_ids = jnp.clip(seg_ids, 0, num_segments)
    return jax.ops.segment_sum(x, seg_ids, num_segments=num_segments + 1)[:num_segments]


def segment_mean(x: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                 valid=None) -> jnp.ndarray:
    """Mean of rows of ``x`` grouped by ``seg_ids`` (scatter_mean parity).

    The count rides as an extra column of the SAME scatter-add (TPU
    scatters are row-issue-bound, width-free at these shapes — measured
    1.19 ms for a lone count column at 131k rows), and per-column adds
    are independent, so fusing is bit-identical to two passes.
    """
    sums, cnts = _segment_sum_with_count(x, seg_ids, num_segments, valid)
    return sums / jnp.maximum(cnts, 1.0)[:, None]


def _segment_sum_with_count(x, seg_ids, num_segments, valid):
    ones = jnp.ones((x.shape[0], 1), x.dtype)
    if valid is not None:
        ones = ones * valid[:, None].astype(x.dtype)
    both = segment_sum(jnp.concatenate([x, ones], axis=-1), seg_ids,
                       num_segments, valid)
    return both[:, :-1], both[:, -1]


def segment_mean_stack(xs, seg_ids: jnp.ndarray, num_segments: int,
                       valid=None):
    """Means of several row-aligned arrays over ONE set of segment ids.

    Same-dtype inputs are concatenated column-wise into a single
    scatter-add (plus one shared count column per dtype group), so k
    pooled quantities cost ~one scatter pass instead of 2k.  Per-column
    adds are independent — results are bit-identical to per-array
    ``segment_mean`` calls.
    """
    order = {}
    for i, x in enumerate(xs):
        order.setdefault(jnp.dtype(x.dtype), []).append(i)
    outs = [None] * len(xs)
    for dt, idxs in order.items():
        cat = jnp.concatenate([xs[i] for i in idxs], axis=-1)
        sums, cnts = _segment_sum_with_count(cat, seg_ids, num_segments,
                                             valid)
        means = sums / jnp.maximum(cnts, 1.0)[:, None]
        col = 0
        for i in idxs:
            w = xs[i].shape[-1]
            outs[i] = means[:, col:col + w]
            col += w
    return outs


def segment_count(seg_ids: jnp.ndarray, num_segments: int, valid=None) -> jnp.ndarray:
    ones = jnp.ones(seg_ids.shape, jnp.float32)
    return segment_sum(ones[:, None], seg_ids, num_segments, valid)[:, 0]


def segment_min(x: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                valid=None, init=jnp.inf) -> jnp.ndarray:
    if valid is not None:
        seg_ids = jnp.where(valid, seg_ids, num_segments)
    seg_ids = jnp.clip(seg_ids, 0, num_segments)
    return jax.ops.segment_min(x, seg_ids, num_segments=num_segments + 1)[:num_segments]


def segment_max(x: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                valid=None) -> jnp.ndarray:
    if valid is not None:
        seg_ids = jnp.where(valid, seg_ids, num_segments)
    seg_ids = jnp.clip(seg_ids, 0, num_segments)
    return jax.ops.segment_max(x, seg_ids, num_segments=num_segments + 1)[:num_segments]
