"""Multi-host (multi-process) eval: batch-sharded loaders + file gather.

The reference refuses multi-card eval (``evaluate_3d.py:45``) and gathers
pickled objects over gloo (``segdino3d/utils/dist_utils.py:83-194``); our
version shards the val set round-robin at batch granularity per process
and merges results through a shared-filesystem gather
(``evaluator.save_shard``/``load_shards``) — metrics must be identical to
a single-process run.
"""
import json
import os

import numpy as np
import pytest


def _fake_result(seed, n_pts=800, n_cls=4, num_stuff=2):
    """Two GT thing instances (> the protocol's MIN_REGION_SIZE=100) +
    three partially-overlapping predictions (one good, one borderline, one
    FP) so the merged metrics are real numbers, not all-nan.  Encoding
    matches ``map_inst_markup``: thing sem/inst ids are offset by
    num_stuff; ids < num_stuff are stuff/void."""
    rng = np.random.RandomState(seed)
    c0, c1 = seed % n_cls, (seed + 1) % n_cls
    sem = np.zeros(n_pts, np.int64)
    inst = np.zeros(n_pts, np.int64)
    sem[0:300], inst[0:300] = c0 + num_stuff, 0 + num_stuff
    sem[300:500], inst[300:500] = c1 + num_stuff, 1 + num_stuff
    ann = dict(pts_instance_mask=inst, pts_semantic_mask=sem,
               lidar_idx=f"scene{seed:04d}")
    masks = np.zeros((3, n_pts), bool)
    masks[0, 0:270] = True       # IoU 0.9 vs gt0 -> TP at 0.5
    masks[1, 300:420] = True     # IoU 0.6 vs gt1 -> TP at 0.5, FP at 0.75
    masks[2, 380:500] = True     # second match on gt1 -> duplicate FP
    pred = dict(
        pts_instance_masks=masks,
        instance_labels=np.array([c0, c1, c1], np.int64),
        instance_scores=rng.rand(3).astype(np.float32))
    return ann, pred


def _evaluator(n_cls=4):
    from segdino3d_tpu.evaluation.evaluator import InstanceSeg3DEvaluator

    return InstanceSeg3DEvaluator(
        valid_class_ids=[1, 2] + [100 + i for i in range(n_cls)],
        class_names=["wall", "floor"] + [f"c{i}" for i in range(n_cls)])


def test_shard_gather_metrics_identical(tmp_path):
    """Gathered 2-process accumulation == single-process accumulation."""
    results = [_fake_result(s) for s in range(7)]

    single = _evaluator()
    for ann, pred in results:
        single.process(ann, pred)
    ref = single.evaluate()

    gd = str(tmp_path / "gather")
    metrics = []
    for rank in range(2):
        ev = _evaluator()
        # round-robin batch shard (batch_size=1 -> scene round-robin)
        for i, (ann, pred) in enumerate(results):
            if i % 2 == rank:
                ev.process(ann, pred)
        ev.save_shard(gd, rank)
    for rank in range(2):
        ev = _evaluator()
        ev.load_shards(gd, 2, timeout_s=5)
        metrics.append(ev.evaluate())

    assert np.isfinite(ref["all_ap"]) and ref["all_ap"] > 0  # meaningful
    for m in metrics:
        for k in ("all_ap", "all_ap_50", "all_ap_25"):
            a, b = ref[k], m[k]
            assert (np.isnan(a) and np.isnan(b)) or a == b, (k, a, b)
        assert set(m["classes"]) == set(ref["classes"])
        for c in ref["classes"]:
            for k in ("ap", "ap50", "ap25"):
                a, b = ref["classes"][c][k], m["classes"][c][k]
                assert (np.isnan(a) and np.isnan(b)) or a == b


def test_load_shards_times_out_on_missing(tmp_path):
    ev = _evaluator()
    ev.save_shard(str(tmp_path), 0)
    with pytest.raises(TimeoutError):
        ev.load_shards(str(tmp_path), 2, timeout_s=0.5)


def test_eval_loader_process_sharding_partitions_batches():
    """Every global batch is served by exactly one process, with identical
    composition to the single-process batch sequence."""
    from segdino3d_tpu.data.collate import PadSpec
    from segdino3d_tpu.data.loader import EvalLoader
    from segdino3d_tpu.data.synthetic import synthetic_scene

    class DS:
        def __len__(self):
            return 7

        def get_record(self, i, rng, sync_scale=None):
            return synthetic_scene(i, n_points=600, n_superpoints=16,
                                   n_classes=6, n_queries2d=4, feat_dim_2d=4)

    spec = PadSpec(1024, 16, 8, 4, 6)

    def scene_sets(loader):
        return [tuple(r["scene_id"] for r in recs) for recs, _ in loader]

    single = scene_sets(EvalLoader(DS(), spec, batch_size=2, prefetch=0))
    shards = [scene_sets(EvalLoader(DS(), spec, batch_size=2, prefetch=0,
                                    process_index=p, process_count=3))
              for p in range(3)]
    for p, sh in enumerate(shards):
        assert sh == single[p::3]
        assert len(sh) == len(EvalLoader(DS(), spec, batch_size=2,
                                         prefetch=0, process_index=p,
                                         process_count=3))
    assert sorted(x for sh in shards for x in sh) == sorted(single)


def _worker(rank, tmpdir, q):
    """Full e2e path in a real OS process: tiny model + sharded loader +
    evaluate(gather_dir=...)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import __graft_entry__ as ge
    from segdino3d_tpu.data.collate import PadSpec
    from segdino3d_tpu.data.loader import EvalLoader
    from segdino3d_tpu.data.synthetic import synthetic_scene
    from segdino3d_tpu.evaluation.evaluate import evaluate

    n_cls, n_sem = 6, 8
    model, _c, test_cfg, variables, _ = ge._build(
        n_points=1024, s_cap=32, i_cap=8, k2d=8, batch=1,
        num_layers=1, d_model=32, n_sem=n_sem, n_inst_cls=n_cls, feat2d=8)

    class DS:
        bg_class_id = 200

        def __len__(self):
            return 5

        def get_record(self, i, rng, sync_scale=None):
            return synthetic_scene(i, n_points=900 + 17 * i,
                                   n_superpoints=32, n_classes=n_cls + 2,
                                   n_queries2d=8, feat_dim_2d=8)

    spec = PadSpec(1024, 32, 8, 8, n_sem)
    tc = dict(test_cfg)
    tc.update(topk_insts=16, npoint_thr=5)
    from segdino3d_tpu.evaluation.evaluator import InstanceSeg3DEvaluator

    ev = InstanceSeg3DEvaluator(
        valid_class_ids=[1, 2] + [100 + i for i in range(n_cls)],
        class_names=["wall", "floor"] + [f"c{i}" for i in range(n_cls)])
    nproc = 1 if rank < 0 else 2
    loader = EvalLoader(DS(), spec, batch_size=2, prefetch=0,
                        process_index=max(rank, 0), process_count=nproc)
    res = evaluate(model, variables, loader, ev, tc, progress=False,
                   gather_dir=os.path.join(tmpdir, "gather"),
                   process_index=max(rank, 0), process_count=nproc)
    q.put((rank, {k: res[k] for k in ("all_ap", "all_ap_50", "all_ap_25")}))


@pytest.mark.slow
def test_two_process_e2e_eval_matches_single(tmp_path):
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(r, str(tmp_path), q))
             for r in range(2)]
    for p in procs:
        p.start()
    out = {}
    for _ in range(2):
        rank, m = q.get(timeout=1800)
        out[rank] = m
    for p in procs:
        p.join(timeout=60)
    # single-process reference in-process
    _worker(-1, str(tmp_path / "single"), q)
    _, ref = q.get(timeout=60)
    for rank in (0, 1):
        for k, v in ref.items():
            a, b = v, out[rank][k]
            assert (np.isnan(a) and np.isnan(b)) or abs(a - b) < 1e-12, \
                (rank, k, a, b)
