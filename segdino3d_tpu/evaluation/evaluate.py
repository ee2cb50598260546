"""Eval driver: run inference over the val set and compute mAP.

Parity target: ``evaluate_3d``
(``/root/reference/evaluation/evaluate_3d.py:44-68``): per-scene no-grad
forward, on-device post-processing (top-k, matrix-NMS, unpooling,
thresholds), GT annotation assembly, AP protocol.  Unlike the reference
(locked to bs=1, single card) the jitted predict path is vmap-able; the
driver transfers only the filtered instance set to the host.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import numpy as np

from segdino3d_tpu.data.collate import eval_annotation
from segdino3d_tpu.models.architecture.postprocess import (
    predict_instance, predict_panoptic, predict_semantic)
from segdino3d_tpu.evaluation.evaluator import InstanceSeg3DEvaluator


def make_predict_fn(model, test_cfg: Dict, filter_outofbox: bool = True,
                    n_stuff: int = 2):
    """Jitted single-scene predict: batch (B=1) -> instance/sem/pan preds."""

    @jax.jit
    def predict(variables, batch):
        outputs, _ = model.apply(variables, batch, False)
        b0 = 0
        inst = predict_instance(
            outputs["cls_preds"][b0], outputs["masks"][b0],
            outputs["query_valid"][b0], outputs["sp_valid"][b0],
            batch.superpoint_ids[b0], batch.point_valid[b0],
            batch.points[b0, :, :3],
            test_cfg.get("inst_score_thr", 0.0), test_cfg,
            centers=None if outputs["centers"] is None else outputs["centers"][b0],
            sizes=None if outputs["sizes"] is None else outputs["sizes"][b0],
            scores_q=None if outputs["scores"] is None else outputs["scores"][b0],
            filter_outofbox=filter_outofbox)
        sem = predict_semantic(outputs["sem_preds"][b0],
                               batch.superpoint_ids[b0])
        pan_inst = predict_instance(
            outputs["cls_preds"][b0], outputs["masks"][b0],
            outputs["query_valid"][b0], outputs["sp_valid"][b0],
            batch.superpoint_ids[b0], batch.point_valid[b0],
            batch.points[b0, :, :3],
            test_cfg.get("pan_score_thr", 0.5), test_cfg,
            centers=None if outputs["centers"] is None else outputs["centers"][b0],
            sizes=None if outputs["sizes"] is None else outputs["sizes"][b0],
            scores_q=None if outputs["scores"] is None else outputs["scores"][b0],
            filter_outofbox=filter_outofbox)
        pan_sem, pan_map = predict_panoptic(
            outputs["sem_preds"][b0], pan_inst, batch.superpoint_ids[b0],
            n_stuff, test_cfg.get("npoint_thr", 100))
        return inst, sem, pan_sem, pan_map

    return predict


def evaluate(model, variables, eval_loader, evaluator: InstanceSeg3DEvaluator,
             test_cfg: Dict, filter_outofbox: bool = True,
             bg_class_id: int = 200, logger=None, progress: bool = True):
    """Run full evaluation; returns the metric dict."""
    predict = make_predict_fn(model, test_cfg, filter_outofbox)
    evaluator.reset()
    log = logger.info if logger else print
    n = len(eval_loader)
    for i, (record, batch) in enumerate(eval_loader):
        inst, sem, pan_sem, pan_map = predict(variables, batch)
        valid = np.asarray(inst.valid)
        n_pts = record["points"].shape[0]
        pred = dict(
            pts_instance_masks=np.asarray(inst.point_masks)[valid][:, :n_pts],
            instance_labels=np.asarray(inst.labels)[valid],
            instance_scores=np.asarray(inst.scores)[valid],
            pts_semantic_mask=np.asarray(sem)[:n_pts],
            pts_panoptic_sem=np.asarray(pan_sem)[:n_pts],
            pts_panoptic_inst=np.asarray(pan_map)[:n_pts],
        )
        ann = eval_annotation(record, bg_class_id)
        evaluator.process(ann, pred)
        if progress and (i % 25 == 0 or i == n - 1):
            log(f"eval [{i + 1}/{n}]")
    return evaluator.evaluate()
