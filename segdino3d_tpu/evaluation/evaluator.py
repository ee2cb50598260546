"""Instance-seg evaluator: accumulates per-scene predictions, computes mAP.

Parity target: ``InstanceSeg3DEvaluator`` + ``evaluate_3d``
(``/root/reference/evaluation/evaluator_3d.py:18-396``,
``evaluation/evaluate_3d.py:44-68``): converts panoptic-style GT markup back
to instance-task ids (``map_inst_markup`` :323-349), feeds the ScanNet AP
protocol with ``valid_class_ids`` minus the stuff classes, and (optionally)
writes benchmark-submission files.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from segdino3d_tpu.evaluation.instance_seg_eval import instance_seg_eval
from segdino3d_tpu.registry import EVALUATORS


def map_inst_markup(sem: np.ndarray, inst: np.ndarray,
                    valid_thing_ids: Sequence[int], num_stuff: int):
    """Reference :323-349 — undo the stuff-merged panoptic encoding."""
    inst = inst.astype(np.int64) - num_stuff
    inst[inst < 0] = -1
    sem = sem.astype(np.int64) - num_stuff
    sem[inst == -1] = -1
    mapping = np.asarray(list(valid_thing_ids) + [-1], np.int64)
    sem = mapping[sem]
    return sem, inst


@EVALUATORS.register_module()
class InstanceSeg3DEvaluator:
    """Accumulate (eval_ann, prediction) pairs; compute ScanNet AP."""

    def __init__(self,
                 valid_class_ids: Sequence[int],
                 class_names: Sequence[str],
                 stuff_class_inds: Sequence[int] = (0, 1),
                 submission_prefix_instance: Optional[str] = None,
                 submission_prefix_semantic: Optional[str] = None,
                 **_unused):
        # NOTE: the reference configs also pass min_num_points / id_offset;
        # those feed only its commented-out panoptic_seg_eval
        # (reference evaluator_3d.py:185-195) — dead there, so accepted
        # here via **_unused and deliberately not stored.  The AP protocol
        # hardcodes MIN_REGION_SIZE=100 exactly like the reference.
        self.valid_class_ids = list(valid_class_ids)
        self.class_names = list(class_names)
        self.num_stuff = len(stuff_class_inds)
        self.submission_prefix_instance = submission_prefix_instance
        self.submission_prefix_semantic = submission_prefix_semantic
        self.reset()

    def reset(self):
        self._results: List = []

    def process(self, eval_ann: Dict, pred: Dict):
        """pred: dict with pts_instance_masks (N, P) bool, labels (N,),
        scores (N,), and optional semantic/panoptic point maps."""
        self._results.append((eval_ann, pred))

    # --- multi-host result gather (reference: pickled-object all_gather
    # over gloo, segdino3d/utils/dist_utils.py:83-194; ours rides a
    # shared filesystem — the one channel every multi-host JAX job has,
    # and the evaluator's numpy accumulation lives host-side anyway) ---
    def save_shard(self, gather_dir: str, process_index: int) -> str:
        """Persist this process's accumulated results (atomic)."""
        import pickle

        os.makedirs(gather_dir, exist_ok=True)
        path = os.path.join(gather_dir, f"shard_{process_index:04d}.pkl")
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(self._results, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
        return path

    def load_shards(self, gather_dir: str, process_count: int,
                    timeout_s: float = 600.0) -> None:
        """Replace the local accumulation with ALL processes' shards,
        merged in rank order (deterministic metric input ordering).  Every
        process may call this — each then computes identical metrics, the
        semantics of the reference's all_gather."""
        import pickle
        import time

        paths = [os.path.join(gather_dir, f"shard_{p:04d}.pkl")
                 for p in range(process_count)]
        deadline = time.monotonic() + timeout_s
        while any(not os.path.exists(p) for p in paths):
            if time.monotonic() > deadline:
                missing = [p for p in paths if not os.path.exists(p)]
                raise TimeoutError(f"eval gather: missing shards {missing}")
            time.sleep(0.2)
        merged: List = []
        for p in paths:
            # writers are atomic (tmp+rename), so an existing file is whole
            with open(p, "rb") as f:
                merged.extend(pickle.load(f))
        self._results = merged

    def evaluate_per_scene(self, out_json: Optional[str] = None) -> Dict:
        """Per-scene metric dump (reference ``compute_each_sample_metrics``
        writing ``ours.json`` when debug=True, evaluator_3d.py:227-321)."""
        import json

        thing_ids = self.valid_class_ids[self.num_stuff:]
        per_scene = {}
        for ann, pred in self._results:
            sem, inst = map_inst_markup(
                ann["pts_semantic_mask"].copy(),
                ann["pts_instance_mask"].copy(), thing_ids, self.num_stuff)
            res = instance_seg_eval(
                [sem], [inst], [pred["pts_instance_masks"]],
                [pred["instance_labels"]], [pred["instance_scores"]],
                valid_class_ids=thing_ids,
                class_labels=self.class_names[self.num_stuff:],
                print_summary=False)
            per_scene[str(ann.get("lidar_idx"))] = dict(
                all_ap=res["all_ap"], all_ap_50=res["all_ap_50"],
                all_ap_25=res["all_ap_25"])
        if out_json:
            with open(out_json, "w") as f:
                json.dump(per_scene, f, indent=1)
        return per_scene

    def evaluate(self) -> Dict:
        if self.submission_prefix_instance:
            self.format_results_instance()
            return {}
        gt_sems, gt_insts, masks, labels, scores = [], [], [], [], []
        thing_ids = self.valid_class_ids[self.num_stuff:]
        for ann, pred in self._results:
            sem, inst = map_inst_markup(
                ann["pts_semantic_mask"].copy(),
                ann["pts_instance_mask"].copy(),
                thing_ids, self.num_stuff)
            gt_sems.append(sem)
            gt_insts.append(inst)
            masks.append(pred["pts_instance_masks"])
            labels.append(pred["instance_labels"])
            scores.append(pred["instance_scores"])
        return instance_seg_eval(
            gt_sems, gt_insts, masks, labels, scores,
            valid_class_ids=thing_ids,
            class_labels=self.class_names[self.num_stuff:],
        )

    # --- benchmark submission writers (reference :351-396) ---
    def format_results_instance(self):
        prefix = self.submission_prefix_instance
        os.makedirs(prefix, exist_ok=True)
        os.makedirs(os.path.join(prefix, "predicted_masks"), exist_ok=True)
        for ann, pred in self._results:
            sid = ann.get("lidar_idx", "scene")
            lines = []
            for i in range(len(pred["instance_labels"])):
                cls = self.valid_class_ids[
                    self.num_stuff + int(pred["instance_labels"][i])]
                score = float(pred["instance_scores"][i])
                rel = f"predicted_masks/{sid}_{i:03d}.txt"
                lines.append(f"{rel} {cls} {score:.4f}")
                np.savetxt(os.path.join(prefix, rel),
                           pred["pts_instance_masks"][i].astype(np.int32),
                           fmt="%d")
            with open(os.path.join(prefix, f"{sid}.txt"), "w") as f:
                # one line per instance incl. trailing newline — byte-level
                # parity with the reference writer (evaluator_3d.py:383)
                f.write("".join(line + "\n" for line in lines))

    def format_results_semantic(self):
        prefix = self.submission_prefix_semantic
        os.makedirs(prefix, exist_ok=True)
        for ann, pred in self._results:
            sid = ann.get("lidar_idx", "scene")
            sem = pred["pts_semantic_mask"]
            out = np.asarray(self.valid_class_ids)[
                np.clip(sem, 0, len(self.valid_class_ids) - 1)]
            np.savetxt(os.path.join(prefix, f"{sid}.txt"), out, fmt="%d")
