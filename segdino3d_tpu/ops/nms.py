"""Matrix NMS for multi-class masks, on-device with static shapes.

Parity target: ``mask_matrix_nms``
(``/root/reference/segdino3d/models/architecture/baseline3d.py:22-141``)
with the 'linear' kernel used by the shipped configs.  Decay:
``score *= min_j (1 - iou_ij) / (1 - compensate_iou_i)`` over
higher-scored same-class masks j.  No filtering/max_num here (the
reference's eval path calls it with defaults: only decay + resort).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def mask_matrix_nms(masks: jnp.ndarray,
                    labels: jnp.ndarray,
                    scores: jnp.ndarray,
                    valid: Optional[jnp.ndarray] = None,
                    kernel: str = "linear",
                    sigma: float = 2.0):
    """Args:
        masks: (N, S) soft masks in [0, 1] (sigmoid scores per superpoint,
            possibly area-weighted by the caller).
        labels: (N,) int class labels.
        scores: (N,) float.
        valid: (N,) bool.

    Returns (new_scores, order) where ``order`` sorts by decayed score
    descending (invalid entries last) and ``new_scores`` are decayed scores
    in the *input* order.
    """
    n = masks.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    scores = jnp.where(valid, scores, -jnp.inf)

    # sort by score descending (reference sorts first; decay compares each
    # mask against higher-scored ones via the upper triangle)
    order0 = jnp.argsort(-scores)
    m = masks[order0]
    lab = labels[order0]
    sc = scores[order0]
    val = valid[order0]

    mf = m.astype(jnp.float32)
    area = mf.sum(-1)
    inter = mf @ mf.T
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-12)

    triu = jnp.triu(jnp.ones((n, n), bool), k=1)
    same = (lab[:, None] == lab[None, :]) & val[:, None] & val[None, :]
    decay_iou = jnp.where(triu & same, iou, 0.0)

    comp = jnp.max(decay_iou, axis=0)                     # compensate per col
    comp_mat = comp[:, None]                              # expand+transpose
    if kernel == "gaussian":
        decay = jnp.exp(-sigma * decay_iou ** 2) / jnp.exp(-sigma * comp_mat ** 2)
        coeff = jnp.min(jnp.where(triu & same, decay, jnp.inf), axis=0)
    elif kernel == "linear":
        decay = (1 - decay_iou) / jnp.maximum(1 - comp_mat, 1e-12)
        coeff = jnp.min(jnp.where(triu & same, decay, jnp.inf), axis=0)
    else:
        raise NotImplementedError(kernel)
    # the reference's min runs over *all* rows; the top-scored row always
    # contributes (1-0)/(1-0) = 1, so the coefficient is capped at 1
    coeff = jnp.minimum(jnp.where(jnp.isfinite(coeff), coeff, 1.0), 1.0)
    new_sc = jnp.where(val, sc * coeff, -jnp.inf)

    # map decayed scores back to input order, produce final ordering
    new_scores_in = jnp.full((n,), -jnp.inf).at[order0].set(new_sc)
    order = jnp.argsort(-new_scores_in)
    return new_scores_in, order
