"""On-device eval post-processing: top-k, matrix-NMS, unpooling, filters.

Parity target: ``Baseline3D.predict_by_feat*``
(``/root/reference/segdino3d/models/architecture/baseline3d.py:373-556``).
All static shapes: the pipeline keeps the top ``topk_insts`` (600) instance
slots with validity flags instead of dynamic filtering; the host evaluator
drops invalid slots after transfer.  The reference is locked to batch-size-1
eval (:335); these functions take single-scene tensors and are vmap-able
for batched TPU inference.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from segdino3d_tpu.ops.nms import mask_matrix_nms


class InstancePred(NamedTuple):
    point_masks: jnp.ndarray   # (N_out, P) bool
    labels: jnp.ndarray        # (N_out,) int32
    scores: jnp.ndarray        # (N_out,) float
    valid: jnp.ndarray         # (N_out,) bool
    boxes: jnp.ndarray         # (N_out, 6) center+size (zeros if absent)


def predict_instance(cls_preds: jnp.ndarray,      # (Q, C+1)
                     mask_logits: jnp.ndarray,    # (Q, S)
                     query_valid: jnp.ndarray,    # (Q,)
                     sp_valid: jnp.ndarray,       # (S,)
                     sp_ids: jnp.ndarray,         # (P,) point -> superpoint
                     point_valid: jnp.ndarray,    # (P,)
                     points_xyz: jnp.ndarray,     # (P, 3)
                     score_threshold: float,
                     test_cfg: Dict,
                     centers: Optional[jnp.ndarray] = None,  # (Q, 3)
                     sizes: Optional[jnp.ndarray] = None,
                     scores_q: Optional[jnp.ndarray] = None,  # (Q, 1) objness
                     filter_outofbox: bool = False) -> InstancePred:
    """Reference :406-486."""
    num_classes = cls_preds.shape[1] - 1
    topk_insts = test_cfg.get("topk_insts", 600)

    probs = jax.nn.softmax(cls_preds, axis=-1)[:, :-1]      # (Q, C)
    if scores_q is not None:
        probs = probs * scores_q
    probs = jnp.where(query_valid[:, None], probs, -1.0)

    flat = probs.reshape(-1)
    k = min(topk_insts, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, k)
    labels = (top_idx % num_classes).astype(jnp.int32)
    qidx = (top_idx // num_classes).astype(jnp.int32)
    inst_valid = top_scores > -0.5

    m_logits = mask_logits[qidx]                            # (k, S)
    m_sig = jax.nn.sigmoid(m_logits) * sp_valid[None, :]

    scores = top_scores
    if test_cfg.get("obj_normalization"):
        pos = (m_logits > 0) & sp_valid[None, :]
        mask_scores = (m_sig * pos).sum(-1) / (pos.sum(-1) + 1e-6)
        scores = scores * mask_scores

    if test_cfg.get("nms"):
        kernel = test_cfg.get("matrix_nms_kernel", "linear")
        new_scores, order = mask_matrix_nms(
            m_sig, labels, scores, valid=inst_valid, kernel=kernel)
        scores = new_scores[order]
        labels = labels[order]
        m_sig = m_sig[order]
        qidx = qidx[order]
        inst_valid = inst_valid[order] & jnp.isfinite(scores)

    # superpoint -> point unpooling + binarize.  Threshold BEFORE the
    # unpool: gathering (k, S) bools to (k, P) moves 4x less HBM than
    # gathering the float sigmoids and comparing after (same result —
    # per-point values are exact copies of their superpoint's).
    sp_safe = jnp.clip(sp_ids, 0, m_sig.shape[1] - 1)
    sp_mask = m_sig > test_cfg.get("sp_score_thr", 0.4)     # (k, S)
    pt_mask = sp_mask[:, sp_safe] & point_valid[None, :]

    # score / npoint thresholds (reference keeps strict >)
    inst_valid = inst_valid & (scores > score_threshold)
    npoints = pt_mask.sum(-1)
    inst_valid = inst_valid & (npoints > test_cfg.get("npoint_thr", 100))

    if centers is not None and sizes is not None:
        box_c = centers[qidx]
        box_s = sizes[qidx]
        boxes = jnp.concatenate([box_c, box_s], axis=-1)
        if filter_outofbox:
            loose = box_s * (1 + 1.5)                       # reference :358
            lo = box_c - loose / 2
            hi = box_c + loose / 2
            inside = jnp.all(
                (points_xyz[None, :, :] >= lo[:, None, :])
                & (points_xyz[None, :, :] <= hi[:, None, :]), axis=-1)
            pt_mask = pt_mask & inside
    else:
        boxes = jnp.zeros((k, 6), cls_preds.dtype)

    scores = jnp.where(inst_valid, scores, 0.0)
    return InstancePred(point_masks=pt_mask, labels=labels, scores=scores,
                        valid=inst_valid, boxes=boxes)


def predict_semantic(sem_preds: jnp.ndarray,     # (S, C_sem+1) (queries==sps)
                     sp_ids: jnp.ndarray,        # (P,)
                     classes: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference :488-507 — per-superpoint argmax broadcast to points.

    ``classes=None`` means all *real* classes: the trailing no-object
    column is excluded from the argmax (reference :539-540 defaults
    ``classes = range(n_sem)``)."""
    cols = sem_preds[:, :-1] if classes is None else sem_preds[:, classes]
    sp_arg = jnp.argmax(cols, axis=-1).astype(jnp.int32)
    sp_safe = jnp.clip(sp_ids, 0, sem_preds.shape[0] - 1)
    return sp_arg[sp_safe]


def predict_panoptic(sem_preds: jnp.ndarray,
                     inst: InstancePred,
                     sp_ids: jnp.ndarray,
                     n_stuff_classes: int,
                     npoint_thr: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference :509-556 — merge stuff semantics with thing instances."""
    stuff_classes = jnp.arange(n_stuff_classes)
    sem_map = predict_semantic(sem_preds, sp_ids, stuff_classes)

    # ascending-score sort: higher score wins the per-point max below
    order = jnp.argsort(jnp.where(inst.valid, inst.scores, jnp.inf))
    masks = inst.point_masks[order] & inst.valid[order][:, None]
    labels = inst.labels[order]

    k = masks.shape[0]
    inst_idxs = (jnp.arange(k, dtype=jnp.int32) + n_stuff_classes)[:, None]
    insts = inst_idxs * masks
    things_inst = jnp.max(insts, axis=0).astype(jnp.int32)
    winner = jnp.argmax(insts, axis=0)
    things_sem = labels[winner] + n_stuff_classes

    # drop tiny instances (> npoint_thr survives, reference :545-548)
    counts = jnp.zeros((k + n_stuff_classes + 1,), jnp.int32).at[
        jnp.clip(things_inst, 0, k + n_stuff_classes)].add(1)
    keep = counts[jnp.clip(things_inst, 0, k + n_stuff_classes)] > npoint_thr
    things_inst = jnp.where(keep | (things_inst == 0), things_inst, 0)

    things_sem = jnp.where(things_inst == 0, 0, things_sem)
    sem_map = jnp.where(things_inst != 0, 0, sem_map)
    inst_map = sem_map + things_inst
    sem_out = sem_map + things_sem
    return sem_out, inst_map
