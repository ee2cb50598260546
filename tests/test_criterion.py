"""Criterion parity tests against a ragged numpy/torch reference
implementation of the loss semantics described in SURVEY.md 搂2 (component
12) — independent re-derivation, validated numerically."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from segdino3d_tpu.models.criterion.losses import (
    InstanceCriterion, ScanNetSemanticCriterion, SparseMatcher,
    _assemble_cost, INF_COST)


def ragged_sparse_match(cost, query_mask, topk=1):
    """Brute-force SparseMatcher: entries strictly below the (k+1)-th
    smallest per column, restricted to queries inside the instance."""
    c = np.where(query_mask.T, cost, INF_COST)
    qs, gs = [], []
    for g in range(c.shape[1]):
        col = c[:, g]
        order = np.sort(col)
        thresh = order[topk] if len(order) > topk else np.inf
        sel = np.where(col < thresh)[0]
        for q in sel:
            qs.append(q)
            gs.append(g)
    return np.array(qs, np.int64), np.array(gs, np.int64)


def make_scene(rng, n_q, n_g, n_s, n_cls=5):
    return dict(
        cls=rng.randn(n_q, n_cls + 1).astype(np.float32),
        mask=rng.randn(n_q, n_s).astype(np.float32),
        ctr=rng.randn(n_q, 3).astype(np.float32),
        sz=rng.rand(n_q, 3).astype(np.float32),
        labels=rng.randint(0, n_cls, n_g).astype(np.int64),
        sp_masks=(rng.rand(n_g, n_s) > 0.6),
        query_masks=(rng.rand(n_g, n_q) > 0.4),
        g_ctr=rng.randn(n_g, 3).astype(np.float32),
        g_sz=rng.rand(n_g, 3).astype(np.float32),
    )


COSTS = [
    dict(type="QueryClassificationCost", weight=0.5),
    dict(type="MaskBCECost", weight=1.0),
    dict(type="MaskDiceCost", weight=1.0),
    dict(type="CenterL1Cost", weight=0.5),
    dict(type="SizeL1Cost", weight=0.5),
]


def ragged_cost(s):
    """Reference cost (torch) for one scene."""
    cls = torch.tensor(s["cls"])
    mask = torch.tensor(s["mask"])
    gt = torch.tensor(s["sp_masks"]).float()
    scores = cls.softmax(-1)
    c_cls = -scores[:, torch.tensor(s["labels"])]
    pos = F.binary_cross_entropy_with_logits(
        mask, torch.ones_like(mask), reduction="none")
    neg = F.binary_cross_entropy_with_logits(
        mask, torch.zeros_like(mask), reduction="none")
    c_bce = (pos @ gt.T + neg @ (1 - gt).T) / mask.shape[1]
    probs = mask.sigmoid()
    num = 2 * probs @ gt.T
    den = probs.sum(-1)[:, None] + gt.sum(-1)[None, :]
    c_dice = 1 - (num + 1) / (den + 1)
    c_ctr = torch.cdist(torch.tensor(s["ctr"]), torch.tensor(s["g_ctr"]), p=1)
    c_sz = torch.cdist(torch.tensor(s["sz"]), torch.tensor(s["g_sz"]), p=1)
    return (0.5 * c_cls + c_bce + c_dice + 0.5 * c_ctr + 0.5 * c_sz).numpy()


class TestSparseMatcher:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        s = make_scene(rng, n_q=20, n_g=6, n_s=30)
        cost = ragged_cost(s)

        # padded version
        our_cost = _assemble_cost(
            COSTS, jnp.asarray(s["cls"]), jnp.asarray(s["mask"]),
            jnp.asarray(s["ctr"]), jnp.asarray(s["sz"]),
            jnp.asarray(s["labels"]), jnp.asarray(s["sp_masks"]),
            jnp.asarray(s["g_ctr"]), jnp.asarray(s["g_sz"]),
            jnp.ones(30, bool))
        np.testing.assert_allclose(np.asarray(our_cost), cost, rtol=1e-4, atol=1e-4)

        m = SparseMatcher(COSTS, topk=1)
        res = m(jnp.asarray(cost), jnp.asarray(s["query_masks"]),
                jnp.ones(20, bool), jnp.ones(6, bool))
        ref_q, ref_g = ragged_sparse_match(cost, s["query_masks"])
        got = sorted(
            (int(q), g) for g in range(6) for k, q in enumerate(np.asarray(res.pair_q)[g])
            if np.asarray(res.pair_valid)[g, k])
        assert got == sorted(zip(ref_q.tolist(), ref_g.tolist()))


def ragged_instance_loss(scenes, matches, loss_weight, n_cls,
                         non_object_weight=0.1, aux=False,
                         fix_dice=True):
    """Torch re-derivation of InstanceCriterion layer loss."""
    B = len(scenes)
    cls_losses, bces, dices, ctrs, szs = [], [], [], [], []
    for s, (iq, ig) in zip(scenes, matches):
        cls_pred = torch.tensor(s["cls"])
        tgt = torch.full((cls_pred.shape[0],), n_cls, dtype=torch.long)
        tgt[torch.tensor(iq)] = torch.tensor(s["labels"])[torch.tensor(ig)]
        w = torch.tensor([1.0] * n_cls + [non_object_weight])
        cls_losses.append(F.cross_entropy(cls_pred, tgt, w))
        pm = torch.tensor(s["mask"])[torch.tensor(iq)]
        tm = torch.tensor(s["sp_masks"]).float()[torch.tensor(ig)]
        bces.append(F.binary_cross_entropy_with_logits(pm, tm))
        probs = pm.sigmoid()
        num = 2 * (probs * tm).sum(-1)
        den = probs.sum(-1) + tm.sum(-1)
        dices.append((1 - (num + 1) / (den + 1)).mean())
        pc = torch.tensor(s["ctr"])[torch.tensor(iq)]
        tc = torch.tensor(s["g_ctr"])[torch.tensor(ig)]
        ctrs.append(F.l1_loss(pc, tc, reduction="none").sum(-1).mean())
        ps = torch.tensor(s["sz"])[torch.tensor(iq)]
        ts = torch.tensor(s["g_sz"])[torch.tensor(ig)]
        szs.append(F.l1_loss(ps, ts, reduction="none").sum(-1).mean())
    cls_loss = torch.stack(cls_losses).mean()
    bce = torch.stack(bces).sum() / B
    if aux:
        dice = torch.stack(dices).sum() / B
    else:
        dice = torch.stack(dices).sum()
    if fix_dice:
        dice = dice / B * 4
    ctr = torch.stack(ctrs).mean()
    sz = torch.stack(szs).mean()
    lw = loss_weight
    return (lw[0] * cls_loss + lw[1] * bce + lw[2] * dice
            + lw[4] * ctr + lw[5] * sz).item()


class TestInstanceCriterion:
    def test_single_layer_parity(self):
        rng = np.random.RandomState(42)
        B, Q, G, S, C = 2, 18, 5, 24, 7
        scenes = [make_scene(rng, Q, G, S, C) for _ in range(B)]

        crit = InstanceCriterion(
            matcher=dict(type="SparseMatcher", costs=COSTS, topk=1),
            loss_weight=[0.5, 1.0, 1.0, 0.5, 0.5, 0.5],
            non_object_weight=0.1, num_classes=C,
            fix_dice_loss_weight=True, iter_matcher=True, fix_mean_loss=True)

        pred = dict(
            cls_preds=jnp.asarray(np.stack([s["cls"] for s in scenes])),
            masks=jnp.asarray(np.stack([s["mask"] for s in scenes])),
            centers=jnp.asarray(np.stack([s["ctr"] for s in scenes])),
            sizes=jnp.asarray(np.stack([s["sz"] for s in scenes])),
            scores=None,
        )
        gt = dict(
            labels=jnp.asarray(np.stack([s["labels"] for s in scenes])),
            sp_masks=jnp.asarray(np.stack([s["sp_masks"] for s in scenes])),
            query_masks=jnp.asarray(np.stack([s["query_masks"] for s in scenes])),
            centers=jnp.asarray(np.stack([s["g_ctr"] for s in scenes])),
            sizes=jnp.asarray(np.stack([s["g_sz"] for s in scenes])),
            query_valid=jnp.ones((B, Q), bool),
            gt_valid=jnp.ones((B, G), bool),
            sp_valid=jnp.ones((B, S), bool),
        )
        got = float(crit(pred, gt))

        matches = [ragged_sparse_match(ragged_cost(s), s["query_masks"])
                   for s in scenes]
        ref = ragged_instance_loss(
            scenes, matches, crit.loss_weight, C, aux=False)
        np.testing.assert_allclose(got, ref, rtol=1e-4)

    @pytest.mark.slow
    def test_padding_invariance(self):
        """Padding queries/gts/superpoints must not change the loss."""
        rng = np.random.RandomState(3)
        B, Q, G, S, C = 2, 10, 4, 16, 5
        scenes = [make_scene(rng, Q, G, S, C) for _ in range(B)]

        crit = InstanceCriterion(
            matcher=dict(type="SparseMatcher", costs=COSTS, topk=1),
            loss_weight=[0.5, 1.0, 1.0, 0.5, 0.5, 0.5],
            non_object_weight=0.1, num_classes=C,
            fix_dice_loss_weight=True, iter_matcher=True)

        def build(pad_q, pad_g, pad_s):
            def padp(x, n, axis):
                pads = [(0, 0)] * x.ndim
                pads[axis] = (0, n)
                return np.pad(x, pads)
            pred = dict(
                cls_preds=jnp.asarray(np.stack(
                    [padp(s["cls"], pad_q, 0) for s in scenes])),
                masks=jnp.asarray(np.stack(
                    [padp(padp(s["mask"], pad_q, 0), pad_s, 1) for s in scenes])),
                centers=jnp.asarray(np.stack(
                    [padp(s["ctr"], pad_q, 0) for s in scenes])),
                sizes=jnp.asarray(np.stack(
                    [padp(s["sz"], pad_q, 0) for s in scenes])),
                scores=None)
            gt = dict(
                labels=jnp.asarray(np.stack(
                    [padp(s["labels"], pad_g, 0) for s in scenes])),
                sp_masks=jnp.asarray(np.stack(
                    [padp(padp(s["sp_masks"], pad_g, 0), pad_s, 1) for s in scenes])),
                query_masks=jnp.asarray(np.stack(
                    [padp(padp(s["query_masks"], pad_g, 0), pad_q, 1) for s in scenes])),
                centers=jnp.asarray(np.stack(
                    [padp(s["g_ctr"], pad_g, 0) for s in scenes])),
                sizes=jnp.asarray(np.stack(
                    [padp(s["g_sz"], pad_g, 0) for s in scenes])),
                query_valid=jnp.asarray(
                    np.arange(Q + pad_q) < Q)[None].repeat(B, 0),
                gt_valid=jnp.asarray(
                    np.arange(G + pad_g) < G)[None].repeat(B, 0),
                sp_valid=jnp.asarray(
                    np.arange(S + pad_s) < S)[None].repeat(B, 0),
            )
            return float(crit(pred, gt))

        base = build(0, 0, 0)
        padded = build(7, 3, 9)
        np.testing.assert_allclose(base, padded, rtol=1e-5)


class TestSemanticCriterion:
    def test_parity(self):
        rng = np.random.RandomState(1)
        B, Q, C = 2, 12, 6
        preds = rng.randn(B, Q, C + 1).astype(np.float32)
        tgts = rng.randint(0, C + 1, (B, Q))  # C == ignore_index
        crit = ScanNetSemanticCriterion(ignore_index=C, loss_weight=0.5)
        got = float(crit(jnp.asarray(preds), jnp.asarray(tgts),
                         jnp.ones((B, Q), bool)))
        losses = []
        for b in range(B):
            losses.append(F.cross_entropy(
                torch.tensor(preds[b, :, :-1]), torch.tensor(tgts[b]),
                ignore_index=C))
        ref = 0.5 * torch.stack(losses).mean()
        np.testing.assert_allclose(got, ref.item(), rtol=1e-5)
