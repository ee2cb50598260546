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
    """Mean of rows of ``x`` grouped by ``seg_ids`` (scatter_mean parity)."""
    ones = jnp.ones(x.shape[:1], x.dtype)
    if valid is not None:
        ones = ones * valid.astype(x.dtype)
    sums = segment_sum(x, seg_ids, num_segments, valid)
    cnts = segment_sum(ones[:, None], seg_ids, num_segments, valid)[:, 0]
    return sums / jnp.maximum(cnts, 1.0)[:, None]


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
