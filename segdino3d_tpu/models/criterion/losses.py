"""Training criterion: matching + semantic/instance losses (padded batch).

Re-implements ``ScanNetUnifiedCriterion`` / ``InstanceCriterion`` /
``SparseMatcher`` / ``HungarianMatcher``
(``/root/reference/segdino3d/models/loss/loss_3d.py:26-780``) as pure XLA
over padded (B, Q, S/G) tensors. Normalization arithmetic replicates the
reference exactly, including its asymmetries:

* main dice loss is summed over scenes then (with ``fix_dice_loss_weight``)
  multiplied by 4/B (:658-663), while aux-layer dice is additionally divided
  by B first (:509-514) — both reproduced verbatim;
* weighted class CE uses torch semantics: sum(w_t * ce) / sum(w_t) with
  no-object weight 0.1 (:395, :609-617);
* mask BCE is the mean over (n_matched x n_superpoints) elements, summed
  over scenes, / B (:625-659);
* center/size L1: sum over xyz, mean over matched, mean over scenes
  (:631-638, :674-681);
* per-layer re-matching when ``iter_matcher`` (:704-708).

The SparseMatcher (:331-365) restricts costs to queries inside the GT
instance (``query_masks``) and keeps per-GT entries strictly below the
(k+1)-th smallest cost — realized here as per-GT top-(k+1) with a strict
comparison, no host round-trip.  The Hungarian matcher runs scipy's LAP
solver through ``jax.pure_callback`` (CPU, like the reference's
``linear_sum_assignment`` call at :311).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from segdino3d_tpu.registry import LOSSES, MATCHERS

INF_COST = 1e8


# ---------------------------------------------------------------------------
# elementary losses
# ---------------------------------------------------------------------------


def sigmoid_bce(logits, targets):
    """Elementwise BCE-with-logits (no reduction)."""
    # log(1+exp(-|x|)) + max(x,0) - x*t  (stable form)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def pairwise_mask_bce_cost(mask_logits, gt_masks, sp_valid):
    """(Q, S) logits x (G, S) {0,1} -> (Q, G) cost, mean over valid S.

    Matches ``batch_sigmoid_bce_loss`` (:63-80) which divides by the full
    n_points; with padding we divide by the count of valid superpoints.
    """
    sp_w = sp_valid.astype(mask_logits.dtype)
    pos = sigmoid_bce(mask_logits, jnp.ones_like(mask_logits)) * sp_w
    neg = sigmoid_bce(mask_logits, jnp.zeros_like(mask_logits)) * sp_w
    gt = gt_masks.astype(mask_logits.dtype) * sp_w
    cost = pos @ gt.T + neg @ (sp_w - gt).T
    return cost / jnp.maximum(sp_w.sum(), 1.0)


def pairwise_dice_cost(mask_logits, gt_masks, sp_valid):
    """Matches ``batch_dice_loss`` (:83-97)."""
    sp_w = sp_valid.astype(mask_logits.dtype)
    probs = jax.nn.sigmoid(mask_logits) * sp_w
    gt = gt_masks.astype(mask_logits.dtype) * sp_w
    num = 2 * probs @ gt.T
    den = probs.sum(-1)[:, None] + gt.sum(-1)[None, :]
    return 1 - (num + 1) / (den + 1)


def dice_loss_pairs(pred_logits, gt, pair_valid, sp_valid):
    """Per-pair dice (last dim = superpoints), mean over valid pairs.

    Matches ``dice_loss`` (:119-136).
    """
    sp_w = sp_valid.astype(pred_logits.dtype)
    probs = jax.nn.sigmoid(pred_logits) * sp_w
    gtw = gt.astype(pred_logits.dtype) * sp_w
    num = 2 * (probs * gtw).sum(-1)
    den = probs.sum(-1) + gtw.sum(-1)
    d = 1 - (num + 1) / (den + 1)
    w = pair_valid.astype(d.dtype)
    return (d * w).sum() / jnp.maximum(w.sum(), 1.0)


def get_iou_pairs(pred_logits, gt, sp_valid):
    """Per-pair IoU of binarized predictions (:100-116)."""
    sp_w = sp_valid.astype(pred_logits.dtype)
    binp = (jax.nn.sigmoid(pred_logits) >= 0.5).astype(pred_logits.dtype) * sp_w
    gtw = (gt > 0.5).astype(pred_logits.dtype) * sp_w
    inter = (binp * gtw).sum(-1)
    union = binp.sum(-1) + gtw.sum(-1) - inter
    return inter / (union + 1e-6)


# ---------------------------------------------------------------------------
# matchers
# ---------------------------------------------------------------------------


class MatchResult(NamedTuple):
    """Per-GT matched queries: (G, k) indices + validity."""
    pair_q: jnp.ndarray      # (G, k) int32 query index per gt slot
    pair_valid: jnp.ndarray  # (G, k) bool


def _assemble_cost(costs_cfg, cls_preds, mask_logits, centers, sizes,
                   labels, gt_sp_masks, gt_centers, gt_sizes, sp_valid):
    """Weighted sum of configured cost terms -> (Q, G)."""
    q = cls_preds.shape[0]
    g = labels.shape[0]
    total = jnp.zeros((q, g), cls_preds.dtype)
    for cost in costs_cfg:
        t, w = cost["type"], cost["weight"]
        if t == "QueryClassificationCost":
            scores = jax.nn.softmax(cls_preds, axis=-1)
            total += w * (-scores[:, labels])
        elif t == "MaskBCECost":
            total += w * pairwise_mask_bce_cost(mask_logits, gt_sp_masks, sp_valid)
        elif t == "MaskDiceCost":
            total += w * pairwise_dice_cost(mask_logits, gt_sp_masks, sp_valid)
        elif t == "CenterL1Cost":
            if centers is not None:
                total += w * jnp.abs(
                    centers[:, None, :] - gt_centers[None, :, :]).sum(-1)
        elif t == "SizeL1Cost":
            if sizes is not None:
                total += w * jnp.abs(
                    sizes[:, None, :] - gt_sizes[None, :, :]).sum(-1)
        else:
            raise ValueError(f"unknown cost {t}")
    return total


@MATCHERS.register_module()
class SparseMatcher:
    """See module docstring (reference :315-365)."""

    def __init__(self, costs, topk=1):
        self.costs = [dict(c) for c in costs]
        self.topk = topk

    def __call__(self, cost, query_masks, query_valid, gt_valid) -> MatchResult:
        """cost: (Q, G); query_masks: (G, Q) bool 'query inside instance'."""
        masked = jnp.where(query_masks.T, cost, INF_COST)
        masked = jnp.where(query_valid[:, None], masked, INF_COST)
        masked = jnp.where(gt_valid[None, :], masked, INF_COST)
        k = self.topk
        # smallest k+1 values per gt column
        neg_vals, idx = jax.lax.top_k(-masked.T, k + 1)  # (G, k+1)
        vals = -neg_vals
        thresh = vals[:, k:k + 1]                        # (G, 1)
        pair_valid = (vals[:, :k] < thresh) & gt_valid[:, None]
        return MatchResult(pair_q=idx[:, :k].astype(jnp.int32),
                           pair_valid=pair_valid)


def _hungarian_host(cost: np.ndarray, n_q: np.ndarray, n_g: np.ndarray):
    from scipy.optimize import linear_sum_assignment

    q_cap, g_cap = cost.shape
    sub = cost[: int(n_q), : int(n_g)]
    rows, cols = linear_sum_assignment(sub)
    pair_q = np.zeros((g_cap,), np.int32)
    pair_valid = np.zeros((g_cap,), bool)
    pair_q[cols] = rows.astype(np.int32)
    pair_valid[cols] = True
    return pair_q, pair_valid


@MATCHERS.register_module()
class HungarianMatcher:
    """Hungarian assignment via host callback (reference :274-312)."""

    def __init__(self, costs):
        self.costs = [dict(c) for c in costs]
        self.topk = 1

    def __call__(self, cost, query_masks, query_valid, gt_valid) -> MatchResult:
        g_cap = cost.shape[1]
        n_q = query_valid.sum().astype(jnp.int32)
        n_g = gt_valid.sum().astype(jnp.int32)
        # valid entries are assumed to be a prefix (builders pad at the end)
        out_shape = (jax.ShapeDtypeStruct((g_cap,), jnp.int32),
                     jax.ShapeDtypeStruct((g_cap,), jnp.bool_))
        pair_q, pair_valid = jax.pure_callback(
            _hungarian_host, out_shape, cost, n_q, n_g, vmap_method="sequential")
        return MatchResult(pair_q=pair_q[:, None], pair_valid=pair_valid[:, None])


# ---------------------------------------------------------------------------
# criteria
# ---------------------------------------------------------------------------


@LOSSES.register_module()
class ScanNetSemanticCriterion:
    """Semantic CE over query semantic targets (reference :26-60)."""

    def __init__(self, ignore_index, loss_weight):
        self.ignore_index = ignore_index
        self.loss_weight = loss_weight

    def __call__(self, sem_preds, sem_targets, query_valid):
        """sem_preds: (B, Q, C+1); sem_targets: (B, Q) int (argmax of the
        semantic one-hot rows); query_valid: (B, Q)."""
        if self.ignore_index >= 0:
            sem_preds = sem_preds[..., :-1]
        logp = jax.nn.log_softmax(sem_preds, axis=-1)
        tgt = jnp.clip(sem_targets, 0, sem_preds.shape[-1] - 1)
        ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        keep = query_valid & (sem_targets != self.ignore_index)
        w = keep.astype(ce.dtype)
        per_scene = (ce * w).sum(-1) / jnp.maximum(w.sum(-1), 1.0)
        return self.loss_weight * per_scene.mean()


class InstanceCriterion:
    """Instance losses with per-layer matching (reference :368-710)."""

    def __init__(self, matcher, loss_weight, non_object_weight, num_classes,
                 fix_dice_loss_weight, iter_matcher, fix_mean_loss=False):
        m = dict(matcher)
        mtype = m.pop("type")
        self.matcher = MATCHERS.get(mtype)(**m)
        self.loss_weight = list(loss_weight)
        self.non_object_weight = non_object_weight
        self.num_classes = num_classes
        self.fix_dice_loss_weight = fix_dice_loss_weight
        self.iter_matcher = iter_matcher
        self.fix_mean_loss = fix_mean_loss

    # ---- single layer ----
    def _match_batch(self, layer, gt):
        def per_scene(cls_p, mask_p, ctr_p, sz_p, labels, sp_m, q_m,
                      g_ctr, g_sz, qv, gv, spv):
            cost = _assemble_cost(
                self.matcher.costs, cls_p, mask_p, ctr_p, sz_p,
                jnp.clip(labels, 0, None), sp_m, g_ctr, g_sz, spv)
            return self.matcher(cost, q_m, qv, gv)

        ctr = layer["centers"]
        sz = layer["sizes"]
        B = layer["cls_preds"].shape[0]
        if ctr is None:
            ctr = sz = None
            fn = lambda c, m, la, sm, qm, gc, gs, qv, gv, spv: per_scene(
                c, m, None, None, la, sm, qm, gc, gs, qv, gv, spv)
            return jax.vmap(fn)(
                layer["cls_preds"], layer["masks"], gt["labels"],
                gt["sp_masks"], gt["query_masks"], gt["centers"], gt["sizes"],
                gt["query_valid"], gt["gt_valid"], gt["sp_valid"])
        return jax.vmap(per_scene)(
            layer["cls_preds"], layer["masks"], ctr, sz, gt["labels"],
            gt["sp_masks"], gt["query_masks"], gt["centers"], gt["sizes"],
            gt["query_valid"], gt["gt_valid"], gt["sp_valid"])

    def _layer_loss(self, layer, gt, match: MatchResult, aux: bool):
        cls_preds = layer["cls_preds"]      # (B, Q, C+1)
        masks = layer["masks"]              # (B, Q, S)
        centers = layer["centers"]          # (B, Q, 3) | None
        sizes = layer["sizes"]
        scores = layer["scores"]
        B, Q = cls_preds.shape[:2]
        G, K = match.pair_q.shape[1:]

        labels = gt["labels"]               # (B, G)
        sp_masks = gt["sp_masks"]           # (B, G, S)
        qv = gt["query_valid"]              # (B, Q)
        spv = gt["sp_valid"]                # (B, S)

        # ----- classification (torch weighted-CE semantics) -----
        # last-write-wins over ascending gt index == pick max matched g per q
        flatg = jnp.broadcast_to(
            jnp.arange(G, dtype=jnp.int32)[None, :, None], match.pair_q.shape)
        b_ix = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None, None], match.pair_q.shape)
        safe_q = jnp.where(match.pair_valid, match.pair_q, Q)  # dump invalid
        best_g = jnp.full((B, Q + 1), -1, jnp.int32).at[
            b_ix.reshape(-1), safe_q.reshape(-1)].max(
            jnp.where(match.pair_valid, flatg, -1).reshape(-1))[:, :Q]
        matched = best_g >= 0
        tgt = jnp.where(matched,
                        jnp.take_along_axis(
                            labels, jnp.clip(best_g, 0, None), axis=1),
                        self.num_classes)
        logp = jax.nn.log_softmax(cls_preds, axis=-1)
        ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        wvec = jnp.where(tgt == self.num_classes, self.non_object_weight, 1.0)
        wvec = wvec * qv.astype(wvec.dtype)
        cls_loss = ((ce * wvec).sum(-1) / jnp.maximum(wvec.sum(-1), 1e-12)).mean()

        # ----- mask losses over matched pairs -----
        pq = jnp.clip(match.pair_q, 0, Q - 1)                  # (B, G, K)
        pv = match.pair_valid                                   # (B, G, K)
        pred_pair = jnp.take_along_axis(
            masks, pq.reshape(B, G * K)[:, :, None], axis=1
        ).reshape(B, G, K, masks.shape[-1])                     # (B,G,K,S)
        gt_pair = jnp.broadcast_to(sp_masks[:, :, None, :], pred_pair.shape)

        sp_w = spv.astype(masks.dtype)                          # (B, S)
        elem_bce = sigmoid_bce(pred_pair, gt_pair.astype(pred_pair.dtype))
        elem_bce = elem_bce * sp_w[:, None, None, :]
        pair_w = pv.astype(masks.dtype)
        # per-scene mean over (n_matched, n_sp_valid) elements:
        per_scene_bce = (elem_bce * pair_w[..., None]).sum((1, 2, 3)) / \
            jnp.maximum(pair_w.sum((1, 2)) * sp_w.sum(-1), 1.0)
        mask_bce_loss = per_scene_bce.sum() / B

        def scene_dice(pp, gp, pvv, sv):
            return dice_loss_pairs(pp.reshape(G * K, -1),
                                   gp.reshape(G * K, -1),
                                   pvv.reshape(G * K), sv)
        per_scene_dice = jax.vmap(scene_dice)(pred_pair, gt_pair, pv, spv)
        if aux:
            mask_dice_loss = per_scene_dice.sum() / B
            if self.fix_dice_loss_weight:
                mask_dice_loss = mask_dice_loss / B * 4
        else:
            mask_dice_loss = per_scene_dice.sum()
            if self.fix_dice_loss_weight:
                mask_dice_loss = mask_dice_loss / B * 4
        # (fix_mean_loss is a no-op when every scene contributes, as in the
        # reference where the skip branch is commented out, :623-624)

        # ----- center / size L1 (sum over xyz, mean matched, mean scenes) --
        def pair_l1(pred, gt_attr):
            pp = jnp.take_along_axis(
                pred, pq.reshape(B, G * K)[:, :, None], axis=1
            ).reshape(B, G, K, 3)
            gg = jnp.broadcast_to(gt_attr[:, :, None, :], pp.shape)
            l1 = jnp.abs(pp - gg).sum(-1)
            w = pv.astype(l1.dtype)
            return ((l1 * w).sum((1, 2)) / jnp.maximum(w.sum((1, 2)), 1.0)).mean()

        center_loss = pair_l1(centers, gt["centers"]) if centers is not None else 0.0
        size_loss = pair_l1(sizes, gt["sizes"]) if sizes is not None else 0.0

        # ----- objectness (IoU regression) -----
        if scores is not None:
            sc_pair = jnp.take_along_axis(
                scores[..., 0], pq.reshape(B, G * K), axis=1).reshape(B, G, K)
            iou = jax.vmap(lambda pp, gp, sv: get_iou_pairs(
                pp.reshape(G * K, -1), gp.reshape(G * K, -1), sv))(
                pred_pair, gt_pair, spv).reshape(B, G, K)
            keep = pv & (iou > 0.5)
            w = keep.astype(iou.dtype)
            mse = jnp.square(sc_pair - iou)
            per_scene = (mse * w).sum((1, 2)) / jnp.maximum(w.sum((1, 2)), 1.0)
            # reference: stack(score_losses).sum() / B where scenes with no
            # kept pairs are skipped
            has = (w.sum((1, 2)) > 0).astype(per_scene.dtype)
            score_loss = (per_scene * has).sum() / B
        else:
            score_loss = 0.0

        lw = self.loss_weight
        loss = (lw[0] * cls_loss + lw[1] * mask_bce_loss
                + lw[2] * mask_dice_loss + lw[3] * score_loss)
        if len(lw) >= 5:
            loss = loss + lw[4] * center_loss
        if len(lw) >= 6:
            loss = loss + lw[5] * size_loss
        return loss

    def __call__(self, pred: Dict[str, Any], gt: Dict[str, jnp.ndarray]):
        """pred: decoder output dict (batched); gt dict with keys
        labels (B,G), sp_masks (B,G,S), query_masks (B,G,Q), centers (B,G,3),
        sizes (B,G,3), query_valid (B,Q), gt_valid (B,G), sp_valid (B,S)."""
        main = {k: pred[k] for k in
                ("cls_preds", "masks", "scores", "centers", "sizes")}
        gtm = dict(gt)
        gtm["query_masks"] = gt["query_masks"]
        match = self._match_batch(main, gtm)
        loss = self._layer_loss(main, gtm, match, aux=False)
        for aux_layer in pred.get("aux_outputs", []):
            m = self._match_batch(aux_layer, gtm) if self.iter_matcher else match
            loss = loss + self._layer_loss(aux_layer, gtm, m, aux=True)
        return loss


@LOSSES.register_module()
class ScanNetUnifiedCriterion:
    """Semantic + instance criterion (reference :713-780)."""

    def __init__(self, num_semantic_classes, sem_criterion, inst_criterion):
        self.num_semantic_classes = num_semantic_classes
        sc = dict(sem_criterion)
        sc.pop("type", None)
        self.sem_criterion = ScanNetSemanticCriterion(**sc)
        ic = dict(inst_criterion)
        ic.pop("type", None)
        self.inst_criterion = InstanceCriterion(**ic)

    def __call__(self, pred, gt):
        """gt additionally carries query_sem_targets (B, Q) — the argmax of
        the semantic one-hot rows restricted to selected queries (the
        reference's ``query_inst_sem_masks[-n-1:]`` argmax, :755-761)."""
        seg_loss = self.sem_criterion(
            pred["sem_preds"], gt["query_sem_targets"], gt["query_valid"])
        inst_loss = self.inst_criterion(pred, gt)
        return {"seg_loss": seg_loss, "inst_loss": inst_loss}
