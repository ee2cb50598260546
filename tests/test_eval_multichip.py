"""Mesh-sharded eval: N virtual devices must produce the SAME metrics as
single-device eval.

This is the throughput capability the reference lacks (eval is explicitly
single-card, ``/root/reference/evaluation/evaluate_3d.py:45``): scenes are
sharded over the ``data`` mesh axis with per-device batch 1 (the measured
optimum — per-chip batching doesn't pay, STATUS.md), post-processed on
device, and gathered host-side.  Identical-metric equivalence on the
8-device CPU mesh is the CI substitute for a v5e-8 run.
"""
import numpy as np
import pytest

# full eval-predict compiles on the CPU mesh take minutes; the per-round
# driver dryrun (__graft_entry__.dryrun_multichip) keeps the sharded eval
# compile-checked in the fast path
pytestmark = pytest.mark.slow


def _tiny_model_and_scenes(n_scenes=5):
    import __graft_entry__ as ge
    from segdino3d_tpu.data.synthetic import synthetic_scene

    n_cls, n_sem = 6, 8
    model, _crit, test_cfg, variables, _ = ge._build(
        n_points=1024, s_cap=32, i_cap=8, k2d=8, batch=1,
        num_layers=1, d_model=32, n_sem=n_sem, n_inst_cls=n_cls, feat2d=8)

    class SynthDataset:
        bg_class_id = 200

        def __len__(self):
            return n_scenes

        def get_record(self, i, rng, sync_scale=None):
            return synthetic_scene(i, n_points=900 + 17 * i,
                                   n_superpoints=32, n_classes=n_cls + 2,
                                   n_queries2d=8, feat_dim_2d=8)

    tc = dict(test_cfg)
    tc.update(topk_insts=16, npoint_thr=5)
    return model, variables, tc, SynthDataset(), n_cls


def _run_eval(model, variables, tc, dataset, n_cls, *, batch_size,
              mesh=None, host_plan_cfg=None):
    from segdino3d_tpu.data.collate import PadSpec
    from segdino3d_tpu.data.loader import EvalLoader
    from segdino3d_tpu.evaluation.evaluate import evaluate
    from segdino3d_tpu.evaluation.evaluator import InstanceSeg3DEvaluator

    spec = PadSpec(1024, 32, 8, 8, 8)
    shards = mesh.devices.size if mesh is not None else 1
    loader = EvalLoader(dataset, spec, batch_size=batch_size,
                        mesh_shards=shards, host_plan_cfg=host_plan_cfg)
    ev = InstanceSeg3DEvaluator(
        valid_class_ids=[1, 2] + [100 + i for i in range(n_cls)],
        class_names=["wall", "floor"] + [f"c{i}" for i in range(n_cls)])
    return evaluate(model, variables, loader, ev, tc, progress=False,
                    mesh=mesh)


def test_mesh_eval_identical_metrics():
    """8-virtual-device eval (batch 8, per-device 1, incl. a padded tail
    batch: 5 scenes -> 3 fillers) == single-device eval (batch 2)."""
    import jax
    from segdino3d_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8
    model, variables, tc, ds, n_cls = _tiny_model_and_scenes(5)

    res_single = _run_eval(model, variables, tc, ds, n_cls, batch_size=2)
    mesh = make_mesh(8)
    res_mesh = _run_eval(model, variables, tc, ds, n_cls, batch_size=8,
                         mesh=mesh)

    for key in ("all_ap", "all_ap_50", "all_ap_25"):
        a, b = res_single[key], res_mesh[key]
        if np.isnan(a) and np.isnan(b):
            continue
        assert np.isclose(a, b, atol=1e-6), (key, a, b)
    for cname, cres in res_single["classes"].items():
        for k, v in cres.items():
            w = res_mesh["classes"][cname][k]
            if np.isnan(v) and np.isnan(w):
                continue
            assert np.isclose(v, w, atol=1e-6), (cname, k, v, w)


def test_mesh_eval_with_host_plans():
    """Same equivalence with host-built sparse plans attached (stacked
    per-shard plan tables — the production v5e-8 configuration)."""
    import jax
    from segdino3d_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8
    model, variables, tc, ds, n_cls = _tiny_model_and_scenes(4)
    plan_cfg = dict(voxel_size=0.02)

    res_single = _run_eval(model, variables, tc, ds, n_cls, batch_size=4,
                           host_plan_cfg=plan_cfg)
    mesh = make_mesh(4)
    res_mesh = _run_eval(model, variables, tc, ds, n_cls, batch_size=4,
                         mesh=mesh, host_plan_cfg=plan_cfg)
    for key in ("all_ap", "all_ap_50", "all_ap_25"):
        a, b = res_single[key], res_mesh[key]
        if np.isnan(a) and np.isnan(b):
            continue
        assert np.isclose(a, b, atol=1e-6), (key, a, b)
