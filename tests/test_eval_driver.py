"""Full eval-driver integration: loader -> predict -> evaluator -> metrics."""
import numpy as np
import pytest


@pytest.mark.slow
def test_evaluate_runs_end_to_end():
    import jax
    import __graft_entry__ as ge
    from segdino3d_tpu.data.collate import PadSpec
    from segdino3d_tpu.data.synthetic import synthetic_scene
    from segdino3d_tpu.evaluation.evaluate import evaluate
    from segdino3d_tpu.evaluation.evaluator import InstanceSeg3DEvaluator

    n_cls, n_sem = 6, 8
    model, _crit, test_cfg, variables, _ = ge._build(
        n_points=1024, s_cap=32, i_cap=8, k2d=8, batch=1,
        num_layers=1, d_model=32, n_sem=n_sem, n_inst_cls=n_cls, feat2d=8)

    class SynthDataset:
        bg_class_id = 200

        def __len__(self):
            return 2

        def get_record(self, i, rng, sync_scale=None):
            return synthetic_scene(i, n_points=1000, n_superpoints=32,
                                   n_classes=n_cls + 2, n_queries2d=8,
                                   feat_dim_2d=8)

    from segdino3d_tpu.data.loader import EvalLoader
    spec = PadSpec(1024, 32, 8, 8, n_sem)
    loader = EvalLoader(SynthDataset(), spec)
    ev = InstanceSeg3DEvaluator(
        valid_class_ids=[1, 2] + [100 + i for i in range(n_cls)],
        class_names=["wall", "floor"] + [f"c{i}" for i in range(n_cls)])
    tc = dict(test_cfg)
    tc.update(topk_insts=16, npoint_thr=5)
    res = evaluate(model, variables, loader, ev, tc, progress=False)
    # untrained model: metrics exist (probably ~0) and are finite or nan
    assert "all_ap" in res and "all_ap_50" in res
    assert len(res["classes"]) == n_cls
