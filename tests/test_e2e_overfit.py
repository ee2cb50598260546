"""End-to-end slice: overfit on synthetic scenes, evaluate mAP.

The acceptance-style test from SURVEY.md §7: train-step + postprocess +
eval driver + evaluator must cooperate to reach (near-)perfect mAP on
memorized scenes. Multi-scene, through the production eval path
(``EvalLoader`` batching + host C++ sparse plans), at a bar a
near-random decoder cannot luck past (convergence probe: loss 12.3 ->
0.43 and AP=AP50=AP25=1.0 by step 150 at lr 2e-3; re-probed after the
per-batch voxel-cap fix). Slow (CPU compile + ~150 full train steps).
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_multiscene_overfit_and_eval_map():
    import __graft_entry__ as ge
    from segdino3d_tpu.data.collate import PadSpec, collate
    from segdino3d_tpu.data.loader import EvalLoader
    from segdino3d_tpu.data.synthetic import synthetic_scene
    from segdino3d_tpu.evaluation.evaluate import evaluate
    from segdino3d_tpu.evaluation.evaluator import InstanceSeg3DEvaluator
    from segdino3d_tpu.parallel.train_step import (create_train_state,
                                                   make_train_step)
    from segdino3d_tpu.train.optim import build_optimizer

    n_cls, n_sem = 8, 10
    n_scenes = 4
    # high BN momentum so running stats converge within the short run;
    # batch = all 4 scenes (full-batch descent on the memorization set).
    # NOTE the per-batch voxel budget: Capacities.num_voxels must be
    # batch x the per-scene cap or later scenes silently lose voxels
    # (the round-3 convergence-blocker bug).
    model, criterion, test_cfg, variables, _ = ge._build(
        n_points=2048, s_cap=64, i_cap=8, k2d=8, batch=n_scenes,
        num_layers=2, d_model=64, n_sem=n_sem, n_inst_cls=n_cls, feat2d=16,
        bn_momentum=0.5)

    recs = [synthetic_scene(i, n_points=2000, n_instances=5,
                            n_superpoints=64, n_classes=n_cls + 2,
                            n_queries2d=8, feat_dim_2d=16, extent=4.0)
            for i in range(n_scenes)]
    spec = PadSpec(2048, 64, 8, 8, n_sem)
    batch = collate(recs, spec)

    tx, _ = build_optimizer(dict(lr=2e-3, weight_decay=0.0),
                            dict(total_iters=600, power=0.9),
                            clip_max_norm=10.0)
    state = create_train_state(variables, tx)
    step = make_train_step(model, criterion, tx, mesh=None, donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(150):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0] * 0.1, losses[::25]

    # ---- full production eval path: EvalLoader batching + host plans ----
    class _DS:
        bg_class_id = 200

        def __len__(self):
            return n_scenes

        def get_record(self, i, rng, sync_scale=None):
            return recs[i]

    tc = dict(test_cfg)
    tc.update(topk_insts=40, npoint_thr=20, inst_score_thr=0.0)
    loader = EvalLoader(_DS(), spec, batch_size=2,
                        host_plan_cfg=dict(voxel_size=0.02))
    evaluator = InstanceSeg3DEvaluator(
        valid_class_ids=[1, 2] + [100 + i for i in range(n_cls)],
        class_names=["wall", "floor"] + [f"c{i}" for i in range(n_cls)])
    vs = {"params": state.params, "batch_stats": state.batch_stats}
    res = evaluate(model, vs, loader, evaluator, tc, progress=False,
                   filter_outofbox=False)
    # memorized scenes through the real eval stack: near-perfect AP
    # (probe reaches 1.0 across the board; thresholds leave seed margin)
    assert res["all_ap_25"] == 1.0, res
    assert res["all_ap_50"] > 0.8, res
    assert res["all_ap"] > 0.8, res
