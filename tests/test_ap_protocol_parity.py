"""ScanNet AP protocol parity against the *executed* reference code.

Runs the reference's vendored benchmark protocol
(``/root/reference/evaluation/utils_instance_seg_3d_eval.py`` — greedy
matching, duplicate-match FP rule, void/ignore handling, convolution-
integrated PR curves) directly via the import stubs, against our
bincount-vectorized from-scratch implementation
(``segdino3d_tpu/evaluation/instance_seg_eval.py``), on random scenes
with exact/perturbed/wrong-label/duplicate/undersized predictions.
Every overall and per-class metric must agree to float precision.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

from reference_import import load_reference_modules

REF = load_reference_modules()

from segdino3d_tpu.evaluation.instance_seg_eval import instance_seg_eval

VALID_IDS = (3, 5, 7, 9)
LABELS = ("cabinet", "chair", "sofa", "table")


def _gt_scene(rng, n_pts):
    sem = np.zeros(n_pts, np.int64)          # background: class 0 (void)
    inst = np.zeros(n_pts, np.int64)
    perm = rng.permutation(n_pts)
    off = 0
    for i in range(8):
        size = rng.randint(130, 400)
        idx = perm[off:off + size]
        off += size
        sem[idx] = VALID_IDS[rng.randint(len(VALID_IDS))]
        inst[idx] = i + 1
    void = perm[off:off + 200]               # a void object (class 99)
    sem[void] = 99
    inst[void] = 9
    return sem, inst


def _preds(rng, sem, inst, n_pts):
    masks, labels, scores = [], [], []

    def add(mask, label_idx):
        masks.append(mask)
        labels.append(label_idx)
        scores.append(float(rng.rand()))

    id2idx = {c: i for i, c in enumerate(VALID_IDS)}
    for i in range(1, 9):
        m = inst == i
        cls_idx = id2idx[int(sem[m][0])]
        if i <= 4:
            add(m.copy(), cls_idx)                       # exact
        elif i <= 6:                                     # perturbed
            pm = m & (rng.rand(n_pts) > 0.3)
            pm |= rng.rand(n_pts) < 0.03
            add(pm, cls_idx)
        else:                                            # wrong label
            add(m.copy(), (cls_idx + 1) % len(VALID_IDS))
    add(inst == 1, id2idx[int(sem[inst == 1][0])])       # duplicate of #1
    add(rng.rand(n_pts) < 0.06, 0)                       # random blob
    tiny = np.zeros(n_pts, bool)
    tiny[:40] = True
    add(tiny, 1)                                         # < min_region_size
    return (np.stack(masks), np.asarray(labels, np.int64),
            np.asarray(scores, np.float32))


@pytest.mark.parametrize("seed", [0, 1])
def test_metrics_match_reference(seed):
    rng = np.random.RandomState(seed)
    n_scenes, n_pts = 2, 3000
    gt_sem, gt_inst, masks, labels, scores = [], [], [], [], []
    for _ in range(n_scenes):
        s, i = _gt_scene(rng, n_pts)
        m, l, sc = _preds(rng, s, i, n_pts)
        gt_sem.append(s)
        gt_inst.append(i)
        masks.append(m)
        labels.append(l)
        scores.append(sc)

    t = torch.as_tensor
    ref = REF["eval_protocol"].instance_seg_eval(
        gt_semantic_masks=[s.copy() for s in gt_sem],
        gt_instance_masks=[i.copy() for i in gt_inst],  # rename_gt mutates
        pred_instance_masks=[t(m) for m in masks],
        pred_instance_labels=[t(l) for l in labels],
        pred_instance_scores=[t(s) for s in scores],
        valid_class_ids=VALID_IDS, class_labels=LABELS,
        print_log_flag=False)

    ours = instance_seg_eval(
        [s.copy() for s in gt_sem], [i.copy() for i in gt_inst],
        masks, labels, scores, VALID_IDS, LABELS, print_summary=False)

    def close(a, b, what):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12,
                                   err_msg=what, equal_nan=True)

    close(ours["all_ap"], ref["all_ap"], "all_ap")
    close(ours["all_ap_50"], ref["all_ap_50%"], "all_ap_50")
    close(ours["all_ap_25"], ref["all_ap_25%"], "all_ap_25")
    for i, name in enumerate(LABELS):
        for ok, rk in (("ap", "ap"), ("ap50", "ap50%"), ("ap25", "ap25%"),
                       ("prec50", "prec50%"), ("rec50", "rec50%")):
            close(ours["classes"][name][ok], ref["classes"][name][rk],
                  f"{name}.{ok}")
