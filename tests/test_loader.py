"""TrainLoader tests: determinism, sync-scale, process sharding."""
import numpy as np

from segdino3d_tpu.data.collate import PadSpec
from segdino3d_tpu.data.loader import ConcatDataset, TrainLoader
from segdino3d_tpu.data.synthetic import synthetic_scene


class SynthDS:
    def __init__(self, n=8, seed_base=0):
        self.n = n
        self.seed_base = seed_base
        self.calls = []

    def __len__(self):
        return self.n

    def get_record(self, idx, rng, sync_scale=None):
        self.calls.append((idx, sync_scale))
        rec = synthetic_scene(self.seed_base + idx, n_points=500,
                              n_superpoints=16, n_classes=8, n_queries2d=4,
                              feat_dim_2d=4)
        if sync_scale is not None:
            rec = dict(rec)
            rec["points"] = rec["points"].copy()
            rec["points"][:, :3] *= sync_scale
        return rec


SPEC = PadSpec(512, 16, 16, 8, 8)


def test_deterministic_batches():
    def collect():
        ds = SynthDS()
        loader = TrainLoader(ds, 2, SPEC, seed=3, num_workers=0)
        it = iter(loader)
        return [next(it) for _ in range(3)], ds.calls

    b1, calls1 = collect()
    b2, calls2 = collect()
    assert calls1 == calls2
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(np.asarray(x.points),
                                      np.asarray(y.points))


def test_sync_scale_shared_per_batch():
    ds = SynthDS()
    loader = TrainLoader(ds, 4, SPEC, seed=0, sync_scale=True, num_workers=0)
    next(iter(loader))
    scales = [s for _, s in ds.calls]
    assert len(set(scales)) == 1 and scales[0] is not None
    assert 0.8 <= scales[0] <= 1.2


def test_process_sharding_disjoint():
    idxs = {}
    for pi in range(2):
        ds = SynthDS()
        loader = TrainLoader(ds, 2, SPEC, seed=7, num_workers=0,
                             process_index=pi, process_count=2)
        it = iter(loader)
        next(it); next(it)
        idxs[pi] = set(i for i, _ in ds.calls)
    assert idxs[0].isdisjoint(idxs[1])


def test_concat_dataset_routing():
    a, b = SynthDS(3, 0), SynthDS(5, 100)
    cat = ConcatDataset([a, b])
    assert len(cat) == 8
    cat.get_record(2, np.random.RandomState(0))
    cat.get_record(3, np.random.RandomState(0))
    assert a.calls[0][0] == 2
    assert b.calls[0][0] == 0


def test_stacked_shards():
    ds = SynthDS()
    loader = TrainLoader(ds, 4, SPEC, seed=0, num_workers=0, mesh_shards=2)
    batch = next(iter(loader))
    # leading axis = shards, each with local batch 2
    assert batch.points.shape[:3] == (2, 2, 512)


class TestBucketing:
    def test_ladder_and_pick(self):
        from segdino3d_tpu.data.bucketing import BucketPolicy, geometric_ladder
        lad = geometric_ladder(1000, 10000, 1.5, 512)
        assert lad[0] >= 1000 and lad[-1] >= 10000
        assert all(b % 512 == 0 for b in lad)
        assert all(b2 > b1 for b1, b2 in zip(lad, lad[1:]))

        pol = BucketPolicy.default(num_semantic_classes=8)
        rec = synthetic_scene(0, n_points=50000, n_superpoints=700,
                              n_classes=8, n_queries2d=20, feat_dim_2d=4)
        spec = pol.spec_for([rec])
        assert spec.num_points >= 50000
        assert spec.num_superpoints >= 700
        assert spec.num_points - 50000 < 50000 * 0.5  # bounded waste

    def test_oversize_raises(self):
        from segdino3d_tpu.data.bucketing import BucketPolicy
        pol = BucketPolicy(point_buckets=(1024,), sp_buckets=(64,),
                           inst_buckets=(8,), q2d_buckets=(8,),
                           num_semantic_classes=8)
        rec = synthetic_scene(0, n_points=2000, n_superpoints=16,
                              n_classes=8, n_queries2d=4, feat_dim_2d=4)
        import pytest as _pytest
        with _pytest.raises(ValueError):
            pol.spec_for([rec])


class TestWorkerModes:
    import pytest as _pytest

    @_pytest.mark.parametrize("shm", [True, False],
                              ids=["shm_transport", "queue_pickle"])
    def test_process_mode_matches_sync(self, tmp_path, shm, monkeypatch):
        """Process-pool workers must yield the identical batch stream as
        the synchronous builder (numpy-leaf batches, same determinism) —
        over both result transports (shared-memory and queue pickle)."""
        # force the shm path even on these tiny batches (spawned workers
        # inherit the env and re-read MIN_SHM_BYTES at import)
        monkeypatch.setenv("SEGDINO_SHM_MIN_BYTES", "1")
        import jax
        from segdino3d_tpu.data.loader import TrainLoader
        from segdino3d_tpu.data.collate import PadSpec
        from segdino3d_tpu.data.synthetic import write_scannet_layout
        from segdino3d_tpu.registry import DATASETS
        import segdino3d_tpu.data.scannet_dataset  # noqa: F401
        import segdino3d_tpu.data.transforms  # noqa: F401

        root = str(tmp_path / "d")
        write_scannet_layout(root, seeds=[0, 1, 2], n_points=1500,
                             n_superpoints=24, n_classes=16, n_instances=4,
                             feat_dim_2d=8)
        ds = DATASETS.build(dict(
            type="ScanNet200InstanceSeg3D", scene_set="train",
            root_scenes=root, use_super_points=True, adjust_class_ids=False,
            exclude_stuffs=False,
            root_points_2dfeats=root + "/features_2d",
            num_semantic_classes=16,
            transform_cfg=dict(type="Scannet200Transforms", voxel_size=0.05)))
        spec = PadSpec(2048, 32, 8, 16, 16)
        kw = dict(batch_size=2, pad_spec=spec, seed=3,
                  host_plan_cfg=dict(voxel_size=0.05, voxel_cap=4096,
                                     block_edges=(4, 4, 4, 4, 4)))
        sync = TrainLoader(ds, num_workers=0, **kw)
        proc = TrainLoader(ds, num_workers=2, worker_mode="process",
                           shm_transport=shm, **kw)
        it_s, it_p = iter(sync), iter(proc)
        got = []
        for _ in range(3):
            bs, bp = next(it_s), next(it_p)
            got.append(bp)
            for a, b in zip(jax.tree_util.tree_leaves(bs),
                            jax.tree_util.tree_leaves(bp)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if shm:
            # under the shm transport earlier batches must stay intact
            # (views into distinct segments, not recycled buffers)
            first_leaf = jax.tree_util.tree_leaves(got[0])[0]
            assert np.isfinite(np.asarray(first_leaf, dtype=np.float64)).all()


class _FailingDS:
    """Module-level (picklable for spawn) dataset that raises on idx 5."""

    def __len__(self):
        return 8

    def get_record(self, idx, rng, sync_scale=None):
        if idx == 5:
            raise ValueError("boom at idx 5")
        return synthetic_scene(idx, n_points=500, n_superpoints=16,
                               n_classes=8, n_queries2d=4, feat_dim_2d=4)


def test_process_worker_exception_propagates():
    """A record-loader exception inside a spawned worker must surface in
    the consuming process (not hang, not be swallowed); the pool must
    shut down cleanly afterwards."""
    import pytest as _pytest

    loader = TrainLoader(_FailingDS(), 4, SPEC, seed=0, num_workers=2,
                         worker_mode="process")
    it = iter(loader)
    with _pytest.raises(ValueError, match="boom at idx 5"):
        for _ in range(4):   # idx 5 appears within the first 2 epochs
            next(it)
    it.close()
