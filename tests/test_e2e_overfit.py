"""End-to-end slice: overfit a tiny model on synthetic scenes, evaluate mAP.

The acceptance-style test from SURVEY.md 搂7: train-step + postprocess +
evaluator must cooperate to reach high mAP on a memorized scene. Slow
(CPU compile of the full train graph) — runs under ``pytest -m slow``.
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_overfit_and_eval_map():
    import __graft_entry__ as ge
    from segdino3d_tpu.data.collate import PadSpec, collate, eval_annotation
    from segdino3d_tpu.data.synthetic import synthetic_scene
    from segdino3d_tpu.evaluation.evaluator import InstanceSeg3DEvaluator
    from segdino3d_tpu.models.architecture.postprocess import predict_instance
    from segdino3d_tpu.parallel.train_step import (create_train_state,
                                                   make_train_step)
    from segdino3d_tpu.train.optim import build_optimizer

    n_cls, n_sem = 8, 10
    # high BN momentum so running stats converge within the short run
    model, criterion, test_cfg, variables, _ = ge._build(
        n_points=2048, s_cap=64, i_cap=8, k2d=8, batch=1,
        num_layers=2, d_model=64, n_sem=n_sem, n_inst_cls=n_cls, feat2d=16,
        bn_momentum=0.5)

    rec = synthetic_scene(0, n_points=2000, n_instances=5, n_superpoints=64,
                          n_classes=n_cls + 2, n_queries2d=8, feat_dim_2d=16,
                          extent=4.0)
    spec = PadSpec(2048, 64, 8, 8, n_sem)
    batch = collate([rec], spec)

    tx, _ = build_optimizer(dict(lr=1e-3, weight_decay=0.0),
                            dict(total_iters=300, power=0.9),
                            clip_max_norm=10.0)
    state = create_train_state(variables, tx)
    step = make_train_step(model, criterion, tx, mesh=None, donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(120):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]

    # ---- eval with the trained weights ----
    vs = {"params": state.params, "batch_stats": state.batch_stats}
    outputs, _ = model.apply(vs, batch, False)
    tc = dict(test_cfg)
    tc.update(topk_insts=40, npoint_thr=20, inst_score_thr=0.0)
    inst = predict_instance(
        outputs["cls_preds"][0], outputs["masks"][0],
        outputs["query_valid"][0], outputs["sp_valid"][0],
        batch.superpoint_ids[0], batch.point_valid[0],
        batch.points[0, :, :3], 0.0, tc,
        centers=outputs["centers"][0], sizes=outputs["sizes"][0],
        filter_outofbox=False)

    valid = np.asarray(inst.valid)
    n_pts = rec["points"].shape[0]
    # fake class ids: use 100+i as 'raw' ids for things
    valid_ids = [100 + i for i in range(n_cls)]
    names = [f"cls{i}" for i in range(n_cls)]
    ev = InstanceSeg3DEvaluator(
        valid_class_ids=[1, 2] + valid_ids, class_names=["wall", "floor"] + names)
    pred = dict(
        pts_instance_masks=np.asarray(inst.point_masks)[valid][:, :n_pts],
        instance_labels=np.asarray(inst.labels)[valid],
        instance_scores=np.asarray(inst.scores)[valid],
    )
    ann = eval_annotation(rec, bg_class_id=200)
    # remap ann sem: synthetic classes 2..9 -> instance-task handled by
    # evaluator's map_inst_markup with thing_ids = valid_ids
    ev.process(ann, pred)
    res = ev.evaluate()
    # memorized scene: decent AP expected
    assert res["all_ap_50"] > 0.3, res["all_ap_50"]
