"""Numeric parity against the *actual reference code* (not re-derivations).

VERDICT round-1 item #4: earlier torch-parity tests re-implemented the
reference's formulas by hand, leaving shared-misunderstanding risk.  Here
the genuine reference modules (``/root/reference/segdino3d/models/loss/
loss_3d.py``, ``module/attention.py``) are imported via the stubs in
``tests/reference_import.py`` and executed on random ragged inputs; our
padded-batch XLA criterion / matcher / attention must agree within fp32
tolerance, including aux-layer re-matching, ``fix_dice_loss_weight`` and
``fix_mean_loss`` renormalizations, and the semantic CE ignore-index.
"""
import copy
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

from reference_import import load_reference_modules

REF = load_reference_modules()

from segdino3d_tpu.models.criterion.losses import (ScanNetUnifiedCriterion,
                                                   InstanceCriterion)
from segdino3d_tpu.ops.attention import multi_head_attention


class RefTarget:
    """Attr + dict access hybrid, like the reference's GD3DTarget."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getitem__(self, k):
        return self.__dict__[k]


def _rand_scene(rng, n_q, n_g, n_sp, n_cls, n_sem, with_boxes):
    sc = dict(
        cls=rng.randn(n_q, n_cls + 1).astype(np.float32),
        sem=rng.randn(n_q, n_sem + 1).astype(np.float32),
        mask=rng.randn(n_q, n_sp).astype(np.float32),
        labels=rng.randint(0, n_cls, n_g).astype(np.int64),
        sp_masks=rng.rand(n_g, n_sp) > 0.6,
        query_masks=rng.rand(n_g, n_q) > 0.4,
        sem_rows=np.eye(n_sem + 1, dtype=bool)[
            rng.randint(0, n_sem + 1, n_q)].T,     # (n_sem+1, n_q) one-hot
    )
    # every gt must admit at least one query (reference data guarantees
    # queries inside each instance exist)
    sc["query_masks"][:, 0] = True
    # every gt mask non-empty for dice stability
    sc["sp_masks"][:, 0] = True
    if with_boxes:
        sc["ctr"] = rng.randn(n_q, 3).astype(np.float32)
        sc["sz"] = np.abs(rng.randn(n_q, 3)).astype(np.float32)
        sc["g_ctr"] = rng.randn(n_g, 3).astype(np.float32)
        sc["g_sz"] = np.abs(rng.randn(n_g, 3)).astype(np.float32)
    return sc


def _ref_loss(scenes, cfg, n_sem, aux_scenes=None):
    """Run the actual reference ScanNetUnifiedCriterion."""
    RefCrit = REF["loss_3d"].ScanNetUnifiedCriterion
    crit = RefCrit(num_semantic_classes=n_sem,
                   sem_criterion=dict(type="ScanNetSemanticCriterion",
                                      ignore_index=n_sem, loss_weight=0.5),
                   inst_criterion=copy.deepcopy(cfg))
    t = torch.as_tensor

    def layer(ss, with_sem):
        with_boxes = "ctr" in ss[0]
        d = dict(
            cls_preds=[t(s["cls"]) for s in ss],
            masks=[t(s["mask"]) for s in ss],
            scores=[None] * len(ss),
            centers=[t(s["ctr"]) if with_boxes else None for s in ss],
            sizes=[t(s["sz"]) if with_boxes else None for s in ss],
        )
        if with_sem:
            d["sem_preds"] = [t(s["sem"]) for s in ss]
        return d

    pred = layer(scenes, True)
    if aux_scenes is not None:
        pred["aux_outputs"] = [layer(a, False) for a in aux_scenes]
    insts = []
    for s in scenes:
        inst_rows = np.concatenate(
            [s["sp_masks"],
             np.zeros((n_sem + 1, s["sp_masks"].shape[1]), bool)], 0)
        q_rows = np.concatenate([s["query_masks"], s["sem_rows"]], 0)
        kw = dict(
            sp_inst_sem_masks=t(inst_rows),
            query_inst_sem_masks=t(q_rows),
            labels=t(s["labels"]),
        )
        if "g_ctr" in s:
            kw["instance_centers"] = t(s["g_ctr"])
            kw["instance_sizes"] = t(s["g_sz"])
        insts.append(RefTarget(**kw))
    out = crit(pred, insts)
    return {k: float(v) for k, v in out.items()}


def _ours_loss(scenes, cfg, n_sem, n_cls, aux_scenes=None):
    """Same data, padded, through our batched criterion."""
    B = len(scenes)
    Q = max(s["cls"].shape[0] for s in scenes) + 3
    G = max(len(s["labels"]) for s in scenes) + 2
    S = max(s["mask"].shape[1] for s in scenes) + 5
    with_boxes = "ctr" in scenes[0]

    def pad_layer(ss):
        cls = np.zeros((B, Q, n_cls + 1), np.float32)
        mask = np.zeros((B, Q, S), np.float32)
        ctr = np.zeros((B, Q, 3), np.float32)
        sz = np.zeros((B, Q, 3), np.float32)
        for b, s in enumerate(ss):
            q, sp = s["mask"].shape
            cls[b, :q] = s["cls"]
            mask[b, :q, :sp] = s["mask"]
            if with_boxes:
                ctr[b, :q] = s["ctr"]
                sz[b, :q] = s["sz"]
        return dict(cls_preds=jnp.asarray(cls), masks=jnp.asarray(mask),
                    centers=jnp.asarray(ctr) if with_boxes else None,
                    sizes=jnp.asarray(sz) if with_boxes else None,
                    scores=None)

    pred = pad_layer(scenes)
    sem = np.zeros((B, Q, n_sem + 1), np.float32)
    for b, s in enumerate(scenes):
        sem[b, :s["sem"].shape[0]] = s["sem"]
    pred["sem_preds"] = jnp.asarray(sem)
    pred["aux_outputs"] = [pad_layer(a) for a in (aux_scenes or [])]

    labels = np.zeros((B, G), np.int32)
    spm = np.zeros((B, G, S), bool)
    qm = np.zeros((B, G, Q), bool)
    gv = np.zeros((B, G), bool)
    qv = np.zeros((B, Q), bool)
    sv = np.zeros((B, S), bool)
    gc = np.zeros((B, G, 3), np.float32)
    gs = np.zeros((B, G, 3), np.float32)
    qsem = np.full((B, Q), n_sem, np.int32)
    for b, s in enumerate(scenes):
        g, sp = s["sp_masks"].shape
        q = s["cls"].shape[0]
        labels[b, :g] = s["labels"]
        spm[b, :g, :sp] = s["sp_masks"]
        qm[b, :g, :q] = s["query_masks"]
        gv[b, :g] = True
        qv[b, :q] = True
        sv[b, :sp] = True
        if with_boxes:
            gc[b, :g] = s["g_ctr"]
            gs[b, :g] = s["g_sz"]
        qsem[b, :q] = s["sem_rows"].argmax(0)
    gt = dict(labels=jnp.asarray(labels), sp_masks=jnp.asarray(spm),
              query_masks=jnp.asarray(qm), gt_valid=jnp.asarray(gv),
              query_valid=jnp.asarray(qv), sp_valid=jnp.asarray(sv),
              centers=jnp.asarray(gc), sizes=jnp.asarray(gs),
              query_sem_targets=jnp.asarray(qsem))
    crit = ScanNetUnifiedCriterion(
        num_semantic_classes=n_sem,
        sem_criterion=dict(type="ScanNetSemanticCriterion",
                           ignore_index=n_sem, loss_weight=0.5),
        inst_criterion=copy.deepcopy(cfg))
    out = crit(pred, gt)
    return {k: float(v) for k, v in out.items()}


SPARSE_COSTS_BOX = [
    dict(type="QueryClassificationCost", weight=0.5),
    dict(type="MaskBCECost", weight=1.0),
    dict(type="MaskDiceCost", weight=1.0),
    dict(type="CenterL1Cost", weight=0.5),
    dict(type="SizeL1Cost", weight=0.5),
]
SPARSE_COSTS = SPARSE_COSTS_BOX[:3]


def _cfg(costs, weights, matcher="SparseMatcher"):
    m = dict(type=matcher, costs=copy.deepcopy(costs))
    if matcher == "SparseMatcher":
        m["topk"] = 1
    return dict(type="InstanceCriterion", matcher=m, loss_weight=list(weights),
                num_classes=None, non_object_weight=0.1,
                fix_dice_loss_weight=True, iter_matcher=True,
                fix_mean_loss=True)


class TestCriterionParity:
    @pytest.mark.parametrize("seed,B,boxes", [
        (0, 1, True), (1, 2, True), (2, 3, True), (3, 2, False),
        (4, 1, False)])
    def test_unified_criterion_matches_reference(self, seed, B, boxes):
        rng = np.random.RandomState(seed)
        n_cls, n_sem = 7, 9
        mk = lambda: [_rand_scene(rng, int(rng.randint(6, 14)),
                                  int(rng.randint(1, 5)),
                                  int(rng.randint(10, 20)), n_cls, n_sem,
                                  boxes) for _ in range(B)]
        scenes = mk()
        # aux layers: same gt, new random predictions per layer
        def aux_like(ss):
            out = []
            for s in ss:
                a = dict(s)
                a["cls"] = rng.randn(*s["cls"].shape).astype(np.float32)
                a["mask"] = rng.randn(*s["mask"].shape).astype(np.float32)
                if boxes:
                    a["ctr"] = rng.randn(*s["ctr"].shape).astype(np.float32)
                    a["sz"] = np.abs(rng.randn(*s["sz"].shape)).astype(np.float32)
                return_s = a
                out.append(return_s)
            return out
        aux = [aux_like(scenes), aux_like(scenes)]

        costs = SPARSE_COSTS_BOX if boxes else SPARSE_COSTS
        weights = [0.5, 1.0, 1.0, 0.5, 0.5, 0.5] if boxes \
            else [0.5, 1.0, 1.0, 0.5]
        cfg = _cfg(costs, weights)
        cfg["num_classes"] = n_cls

        ref = _ref_loss(scenes, copy.deepcopy(cfg), n_sem, aux)
        ours = _ours_loss(scenes, copy.deepcopy(cfg), n_sem, n_cls, aux)
        assert abs(ref["seg_loss"] - ours["seg_loss"]) < 2e-4, (ref, ours)
        assert abs(ref["inst_loss"] - ours["inst_loss"]) < 2e-3, (ref, ours)

    def test_hungarian_matches_reference(self):
        rng = np.random.RandomState(7)
        n_cls, n_sem = 5, 6
        scenes = [_rand_scene(rng, 8, 3, 12, n_cls, n_sem, False)
                  for _ in range(2)]
        cfg = _cfg(SPARSE_COSTS, [0.5, 1.0, 1.0, 0.5], "HungarianMatcher")
        cfg["num_classes"] = n_cls
        ref = _ref_loss(scenes, copy.deepcopy(cfg), n_sem)
        ours = _ours_loss(scenes, copy.deepcopy(cfg), n_sem, n_cls)
        assert abs(ref["inst_loss"] - ours["inst_loss"]) < 2e-3, (ref, ours)


class TestSparseMatcherParity:
    @pytest.mark.parametrize("seed", range(5))
    def test_matched_pairs_equal(self, seed):
        rng = np.random.RandomState(seed + 100)
        n_q, n_g, n_sp, n_cls = 12, 4, 16, 6
        s = _rand_scene(rng, n_q, n_g, n_sp, n_cls, 5, True)
        t = torch.as_tensor
        RefSparse = REF["loss_3d"].SparseMatcher
        InstanceData = REF["loss_3d"].InstanceData
        ref_m = RefSparse(costs=copy.deepcopy(SPARSE_COSTS_BOX), topk=1)
        pred = InstanceData(scores=t(s["cls"]), masks=t(s["mask"]),
                            centers=t(s["ctr"]), sizes=t(s["sz"]))
        gt = InstanceData(labels=t(s["labels"]), masks=t(s["sp_masks"]),
                          query_masks=t(s["query_masks"]),
                          instance_centers=t(s["g_ctr"]),
                          instance_sizes=t(s["g_sz"]))
        rq, rg = ref_m(pred, gt)
        ref_pairs = set(zip(rq.numpy().tolist(), rg.numpy().tolist()))

        from segdino3d_tpu.models.criterion.losses import (SparseMatcher,
                                                           _assemble_cost)
        ours_m = SparseMatcher(costs=copy.deepcopy(SPARSE_COSTS_BOX), topk=1)
        j = jnp.asarray
        cost = _assemble_cost(
            copy.deepcopy(SPARSE_COSTS_BOX), j(s["cls"]), j(s["mask"]),
            j(s["ctr"]), j(s["sz"]), j(s["labels"].astype(np.int32)),
            j(s["sp_masks"]), j(s["g_ctr"]), j(s["g_sz"]),
            j(np.ones(n_sp, bool)))
        res = ours_m(cost, j(s["query_masks"]), j(np.ones(n_q, bool)),
                     j(np.ones(n_g, bool)))
        pq = np.asarray(res.pair_q)        # (G, k) query idx per gt slot
        pv = np.asarray(res.pair_valid)
        gidx = np.broadcast_to(np.arange(n_g)[:, None], pq.shape)
        our_pairs = set(zip(pq[pv].tolist(), gidx[pv].tolist()))
        assert our_pairs == ref_pairs


class TestAttentionParity:
    @pytest.mark.parametrize("seed", range(3))
    def test_projection_free_mha_vs_reference(self, seed):
        """Concat-PE cross-attention: q/k are 2*D, v is D, custom scale."""
        rng = np.random.RandomState(seed)
        D, H, Q, S = 32, 4, 7, 11
        q = rng.randn(Q, 2 * D).astype(np.float32)
        k = rng.randn(S, 2 * D).astype(np.float32)
        v = rng.randn(S, D).astype(np.float32)
        blocked = rng.rand(Q, S) > 0.7
        blocked[:, 0] = False        # keep at least one key visible
        RefMHA = REF["attention"].MultiheadAttention
        mha = RefMHA(2 * D, H, dropout=0.0, vdim=D)
        t = torch.as_tensor
        with torch.no_grad():
            out_ref, _ = mha(t(q)[:, None], t(k)[:, None], t(v)[:, None],
                             attn_mask=t(blocked))
        out_ref = out_ref[:, 0].numpy()

        ours = multi_head_attention(
            jnp.asarray(q)[None], jnp.asarray(k)[None], jnp.asarray(v)[None],
            H, blocked=jnp.asarray(blocked)[None],
            scale=float(2 * D // H) ** -0.5)
        w = mha.out_proj.weight.detach().numpy()
        b = mha.out_proj.bias.detach().numpy()
        out_ours = np.asarray(ours)[0] @ w.T + b
        np.testing.assert_allclose(out_ours, out_ref, atol=2e-5)
