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


def test_spconv_v2_overfit_and_eval_map():
    """Same acceptance slice for the second flagship family: SpConvUNet
    (recursive U-Net, indice-key inverse convs, centered-xyz features,
    exact-min-shift quantization) must also memorize scenes to high AP
    through the production eval path — gradient parity alone doesn't
    prove the spconv stack *trains*."""
    from segdino3d_tpu.builder import Capacities, build_model
    from segdino3d_tpu.data.collate import PadSpec, collate
    from segdino3d_tpu.data.loader import EvalLoader
    from segdino3d_tpu.data.synthetic import synthetic_scene
    from segdino3d_tpu.evaluation.evaluate import evaluate
    from segdino3d_tpu.evaluation.evaluator import InstanceSeg3DEvaluator
    from segdino3d_tpu.parallel.train_step import (create_train_state,
                                                   make_train_step)
    from segdino3d_tpu.train.optim import build_optimizer

    n_cls, n_sem = 8, 10
    n_scenes = 2
    caps = Capacities(num_points=2048, num_voxels=2048 * n_scenes,
                      num_superpoints=64, num_instances=8, num_queries2d=8)
    model_cfg = dict(
        type="SegDINO3D", num_classes=n_cls, query_thr=0.5,
        mode_3d_center="median", add_positional_embedding=True,
        pointcloud_backbone_cfg=dict(
            type="SpConvUNet", num_planes=[16, 24, 32], block_reps=1,
            in_channels=16 + 6, voxel_size=0.02,
            mode_fuse_2d_feat="early_fusion",
            bn_momentum=0.5),
        decoder_cfg=dict(
            type="ScanNetQueryDecoder", num_layers=2,
            num_instance_classes=n_cls, num_semantic_classes=n_sem,
            in_channels=16, d_model=64, num_heads=4, hidden_dim=128,
            dropout=0.0, activation_fn="gelu", iter_pred=True,
            attn_mask=True, fix_attention=True, objectness_flag=False,
            add_dinox_query_ca=True, add_dinox_query_ca_mask=True,
            add_positional_embedding=True, pos_type="sine", temperature=20,
            add_box_size_pred=True, box_modulate_ca=True,
            normalize_box_prediction=True),
        criterion_cfg=dict(
            type="ScanNetUnifiedCriterion", num_semantic_classes=n_sem,
            sem_criterion=dict(type="ScanNetSemanticCriterion",
                               ignore_index=n_sem, loss_weight=0.5),
            inst_criterion=dict(
                type="InstanceCriterion",
                matcher=dict(type="SparseMatcher", topk=1, costs=[
                    dict(type="QueryClassificationCost", weight=0.5),
                    dict(type="MaskBCECost", weight=1.0),
                    dict(type="MaskDiceCost", weight=1.0)]),
                loss_weight=[0.5, 1.0, 1.0, 0.5],
                num_classes=n_cls, non_object_weight=0.1,
                fix_dice_loss_weight=True, iter_matcher=True,
                fix_mean_loss=True)),
        test_cfg=dict(topk_insts=40, inst_score_thr=0.0, pan_score_thr=0.5,
                      npoint_thr=20, obj_normalization=True,
                      sp_score_thr=0.4, nms=True,
                      matrix_nms_kernel="linear", stuff_classes=[0, 1]),
    )
    model, criterion, test_cfg = build_model(model_cfg, caps)

    recs = [synthetic_scene(i, n_points=2000, n_instances=5,
                            n_superpoints=64, n_classes=n_cls + 2,
                            n_queries2d=8, feat_dim_2d=16, extent=4.0)
            for i in range(n_scenes)]
    spec = PadSpec(2048, 64, 8, 8, n_sem)
    batch = collate(recs, spec)
    rngs = {"params": jax.random.PRNGKey(0), "queries": jax.random.PRNGKey(1)}
    variables = jax.jit(model.init, static_argnums=(2,))(rngs, batch, False)

    tx, _ = build_optimizer(dict(lr=2e-3, weight_decay=0.0),
                            dict(total_iters=600, power=0.9),
                            clip_max_norm=10.0)
    state = create_train_state(variables, tx)
    step = make_train_step(model, criterion, tx, mesh=None, donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(120):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0] * 0.15, losses[::20]

    class _DS:
        bg_class_id = 200

        def __len__(self):
            return n_scenes

        def get_record(self, i, rng, sync_scale=None):
            return recs[i]

    loader = EvalLoader(_DS(), spec, batch_size=2,
                        host_plan_cfg=dict(voxel_size=0.02, stem_kernel=3,
                                           exact_min_shift=True))
    evaluator = InstanceSeg3DEvaluator(
        valid_class_ids=[1, 2] + [100 + i for i in range(n_cls)],
        class_names=["wall", "floor"] + [f"c{i}" for i in range(n_cls)])
    vs = {"params": state.params, "batch_stats": state.batch_stats}
    res = evaluate(model, vs, loader, evaluator, test_cfg, progress=False,
                   filter_outofbox=False)
    assert res["all_ap_25"] == 1.0, res
    assert res["all_ap_50"] > 0.7, res
