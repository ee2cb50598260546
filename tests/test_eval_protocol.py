"""Hand-computed fixture tests for the ScanNet AP protocol."""
import numpy as np

from segdino3d_tpu.evaluation.instance_seg_eval import (
    DEFAULT_OVERLAPS, instance_seg_eval)
from segdino3d_tpu.evaluation.evaluator import map_inst_markup

VALID = [3, 5]
NAMES = ["chairish", "tablish"]


def scene(n=1200):
    """Two GT instances of class 3 and one of class 5."""
    sem = np.full(n, -1, np.int64)
    inst = np.full(n, -1, np.int64)
    sem[0:300] = 3
    inst[0:300] = 0
    sem[300:500] = 3
    inst[300:500] = 1
    sem[500:800] = 5
    inst[500:800] = 2
    return sem, inst


def pred_masks_from_slices(slices, n=1200):
    masks = np.zeros((len(slices), n), bool)
    for i, (a, b) in enumerate(slices):
        masks[i, a:b] = True
    return masks


class TestAPProtocol:
    def test_perfect_predictions(self):
        sem, inst = scene()
        masks = pred_masks_from_slices([(0, 300), (300, 500), (500, 800)])
        labels = np.array([0, 0, 1])
        scores = np.array([0.9, 0.8, 0.95])
        res = instance_seg_eval([sem], [inst], [masks], [labels], [scores],
                                VALID, NAMES, print_summary=False)
        assert np.isclose(res["all_ap"], 1.0)
        assert np.isclose(res["all_ap_50"], 1.0)
        assert np.isclose(res["all_ap_25"], 1.0)

    def test_half_overlap(self):
        """A prediction covering half of gt0 + background: IoU vs gt0 =
        150/(300+150+... ) < 0.5 -> FP at 0.5, counted differently at 0.25."""
        sem, inst = scene()
        # 150 pts inside gt0, 150 outside any gt (void is sem=-1 -> ignored!)
        masks = pred_masks_from_slices([(150, 450)])  # 150 in gt0, 150 in gt1
        labels = np.array([0])
        scores = np.array([0.9])
        res = instance_seg_eval([sem], [inst], [masks], [labels], [scores],
                                VALID, NAMES, print_summary=False)
        # IoU vs gt0 = 150/(300+300-150)=0.333; vs gt1 = 150/(200+300-150)=0.429
        # at tau=0.25: matches gt0 first (insertion order) -> 1 TP, 1 FN -> AP?
        # class0: 2 gts, 1 pred matched: precision 1, recall 0.5
        assert res["classes"]["chairish"]["ap25"] > 0.2
        assert res["classes"]["chairish"]["ap50"] == 0.0
        # class 'tablish' has gt but no preds -> ap 0
        assert res["classes"]["tablish"]["ap50"] == 0.0

    def test_void_ignored(self):
        """Predictions mostly covering void (unlabeled) points are not FPs."""
        sem, inst = scene()
        masks = pred_masks_from_slices([(0, 300), (300, 500), (500, 800),
                                        (800, 1200)])  # 4th pure void
        labels = np.array([0, 0, 1, 0])
        scores = np.array([0.9, 0.8, 0.95, 0.99])
        res = instance_seg_eval([sem], [inst], [masks], [labels], [scores],
                                VALID, NAMES, print_summary=False)
        assert np.isclose(res["all_ap"], 1.0)  # void pred fully ignored

    def test_duplicate_match_is_fp(self):
        sem, inst = scene()
        masks = pred_masks_from_slices([(0, 300), (0, 300), (300, 500),
                                        (500, 800)])
        labels = np.array([0, 0, 0, 1])
        scores = np.array([0.9, 0.85, 0.8, 0.95])
        res = instance_seg_eval([sem], [inst], [masks], [labels], [scores],
                                VALID, NAMES, print_summary=False)
        # class 0: preds: TP(0.9), FP-duplicate(0.85), TP(0.8)
        # PR: sorted asc [0.8 TP, 0.85 FP, 0.9 TP]
        # thresholds: 0.8: tp=2 fp=1 fn=0 -> p=2/3 r=1 ; 0.85: tp=1 fp=1 fn=1
        #  -> p=.5 r=.5 ; 0.9: tp=1 fp=0 fn=1 -> p=1 r=.5 ; artificial (1,0)
        c = res["classes"]["chairish"]
        assert c["ap50"] < 1.0
        assert np.isclose(res["classes"]["tablish"]["ap50"], 1.0)

    def test_small_gt_filtered(self):
        """GT below 100 points is excluded from matching; a pred covering it
        is ignored, not an FP."""
        n = 600
        sem = np.full(n, -1, np.int64)
        inst = np.full(n, -1, np.int64)
        sem[0:50] = 3
        inst[0:50] = 0        # tiny gt (<100)
        sem[50:350] = 3
        inst[50:350] = 1
        masks = pred_masks_from_slices([(50, 350), (0, 150)], n)
        # second pred: 50 pts on tiny gt + 100 on gt1(already matched):
        labels = np.array([0, 0])
        scores = np.array([0.9, 0.8])
        res = instance_seg_eval([sem], [inst], [masks], [labels], [scores],
                                VALID, NAMES, print_summary=False)
        assert res["classes"]["chairish"]["ap50"] == 1.0


class TestMapInstMarkup:
    def test_roundtrip(self):
        # panoptic-merged markup: stuff ids 0,1; things shifted by 2
        sem = np.array([0, 1, 5, 5, 7, 200])
        inst = np.array([0, 1, 2, 2, 3, -1])
        thing_ids = [30, 40, 50, 60, 70, 80]
        sem_out, inst_out = map_inst_markup(sem, inst, thing_ids, 2)
        np.testing.assert_array_equal(inst_out, [-1, -1, 0, 0, 1, -1])
        # sem 5 - 2 = 3 -> thing_ids[3] = 60 ; sem 7-2=5 -> 80
        np.testing.assert_array_equal(sem_out, [-1, -1, 60, 60, 80, -1])


class TestNoisyAnnotations:
    def test_multiclass_instance_majority_vote(self):
        """Real ScanNet annotation noise: one gt instance labeled with two
        semantic classes must not abort the eval (majority class wins)."""
        import warnings as _w
        from segdino3d_tpu.evaluation.instance_seg_eval import encode_gt_ids

        sem = np.array([3, 3, 3, 5, 3, 3], np.int64)
        inst = np.array([7, 7, 7, 7, 8, 8], np.int64)
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            out = encode_gt_ids(sem, inst, valid_class_ids=[3, 5])
        assert any("majority" in str(r.message) for r in rec)
        np.testing.assert_array_equal(
            out, [3007, 3007, 3007, 3007, 3008, 3008])
