"""Eval recompile audit (round-3 verdict #8).

Eval jits one program per distinct batch-shape signature.  Before round 4
the per-batch auto-bucketing produced ~one signature per scene at val
scale (measured: 38 over 48 val-sized scenes — block caps at 5 levels
bucketed independently).  The EvalLoader's capacity prescan
(``EvalLoader._prescan``) fixes this: one count-only C++ pass pins a
single plan-cap vector per PadSpec rung, so the whole val set compiles to
#occupied-rungs programs (~16 s/shape on v5e, paid once per process and
cached by the persistent compilation cache).

The reference never faces this (eager torch, bs=1, no compilation —
``evaluation/evaluate_3d.py:35``).
"""
import numpy as np
import pytest

from segdino3d_tpu.data.bucketing import BucketPolicy
from segdino3d_tpu.data.loader import EvalLoader
from segdino3d_tpu.data.synthetic import synthetic_scene


class _SynthEvalDataset:
    """48 scenes spanning the ScanNet-val size range (~40k-400k points,
    log-spaced deciles + jitter)."""

    def __init__(self, n=48, lo=40_000, hi=400_000):
        rng = np.random.RandomState(0)
        base = np.exp(np.linspace(np.log(lo), np.log(hi), n // 3))
        self.sizes = np.concatenate(
            [base * (1 + rng.uniform(-0.08, 0.08, n // 3))
             for _ in range(3)]).astype(int)

    def __len__(self):
        return len(self.sizes)

    def get_record(self, i, rng=None, sync_scale=None):
        n_pts = int(self.sizes[i])
        return synthetic_scene(
            i, n_points=n_pts,
            n_superpoints=int(np.clip(n_pts // 80, 256, 4096)),
            n_instances=int(np.clip(n_pts // 6000, 6, 60)),
            n_classes=40, feat_dim_2d=8)


def _tree_signature(batch):
    import jax

    return tuple((str(p), tuple(x.shape), str(np.asarray(x).dtype))
                 for p, x in jax.tree_util.tree_flatten_with_path(batch)[0])


@pytest.mark.slow
def test_val_size_distribution_bounded_compile_count():
    policy = BucketPolicy.default(200, max_points=524288,
                                  max_superpoints=8192,
                                  max_instances=256, max_queries2d=256)
    ds = _SynthEvalDataset()
    loader = EvalLoader(
        ds, bucket_policy=policy, batch_size=1, prefetch=0,
        host_plan_cfg=dict(voxel_size=0.02,
                           level_cap_ratios=(1.0, 0.4, 0.15, 0.06, 0.025),
                           block_edges=[4, 4, 4, 4, 4], stem_gather=True))

    sigs, rungs = set(), set()
    for recs, batch in loader:
        sigs.add(_tree_signature(batch))
        rungs.add(_tree_signature(
            {"pts": np.zeros(batch.points.shape)}))  # PadSpec rung proxy

    n_shapes, n_rungs = len(sigs), len(loader._prescan())
    # the invariant the prescan guarantees: exactly one compiled program
    # per occupied PadSpec rung
    assert n_shapes == n_rungs, (n_shapes, n_rungs)
    # and the rung count itself stays within the eval compile budget:
    # <= 14 programs x ~16 s/shape < 4 min, once per process
    assert n_shapes <= 14, (
        f"{n_shapes} distinct eval shapes over {len(ds)} val-sized scenes")
    assert n_shapes <= len(ds) // 3


@pytest.mark.slow
def test_prescan_caps_cover_every_scene():
    """The pinned per-rung caps must never overflow on any scene of the
    set they were prescanned from (plans raise on overflow)."""
    policy = BucketPolicy.default(200, max_points=524288,
                                  max_superpoints=8192,
                                  max_instances=256, max_queries2d=256)
    ds = _SynthEvalDataset(n=12)
    loader = EvalLoader(
        ds, bucket_policy=policy, batch_size=1, prefetch=0,
        host_plan_cfg=dict(voxel_size=0.02,
                           level_cap_ratios=(1.0, 0.4, 0.15, 0.06, 0.025),
                           block_edges=[4, 4, 4, 4, 4], stem_gather=True))
    seen = 0
    for recs, batch in loader:   # attach_host_plan raises on overflow
        seen += len(recs)
    assert seen == len(ds)
