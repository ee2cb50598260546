"""Persistent eval batch cache (data/eval_cache.py).

Correctness bar (round-4 VERDICT #1): a cached batch is bit-exact equal to
a freshly built one — the cache may change eval's host cost, never its
numerics — and the slim cached records carry exactly what the eval driver
consumes (GT annotation arrays + point count)."""
import numpy as np
import pytest


def _flat(tree):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, str(treedef)


def _assert_tree_bitexact(a, b):
    la, ta = _flat(a)
    lb, tb = _flat(b)
    assert ta == tb
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if isinstance(x, np.ndarray) or hasattr(x, "__array__"):
            x, y = np.asarray(x), np.asarray(y)
            assert x.dtype == y.dtype, (x.dtype, y.dtype)
            assert x.shape == y.shape
            assert np.array_equal(x, y, equal_nan=True)
        else:
            assert x == y


def test_bundle_roundtrip_mixed_leaves(tmp_path):
    from segdino3d_tpu.data.eval_cache import load_bundle, save_bundle

    tree = {
        "f32": np.random.RandomState(0).randn(7, 3).astype(np.float32),
        "f16": np.random.RandomState(1).randn(5, 4).astype(np.float16),
        "bools": np.array([[True, False], [False, True]]),
        "i64": np.arange(11, dtype=np.int64),
        "scalar0d": np.float32(3.5) * np.ones((), np.float32),
        "empty": np.zeros((0, 4), np.int32),
        "none": None,
        "string": "scene0042",
        "pyint": 7,
        "nested": [{"a": np.uint32([1, 2, 3])}, (np.int8([-1]), 2.5)],
    }
    p = str(tmp_path / "bundle.bin")
    save_bundle(p, tree)
    back = load_bundle(p)
    _assert_tree_bitexact(tree, back)
    assert back["scalar0d"].shape == ()      # 0-d survives (not (1,))
    # mmap views are read-only — a consumer mutating a cached batch is a bug
    with pytest.raises(ValueError):
        back["i64"][0] = 99


class _DS:
    bg_class_id = 200

    def __init__(self, n=5, n_cls=6):
        self.n, self.n_cls = n, n_cls

    def __len__(self):
        return self.n

    def get_record(self, i, rng, sync_scale=None):
        from segdino3d_tpu.data.synthetic import synthetic_scene

        return synthetic_scene(i, n_points=900 + 31 * i, n_superpoints=32,
                               n_classes=self.n_cls + 2, n_queries2d=8,
                               feat_dim_2d=8)


def _loader(cache_dir=None, plan=True, **kw):
    from segdino3d_tpu.data.collate import PadSpec
    from segdino3d_tpu.data.loader import EvalLoader

    spec = PadSpec(1024, 32, 8, 8, 8)
    cfg = dict(voxel_size=0.02, voxel_cap=2048) if plan else None
    return EvalLoader(_DS(), spec, batch_size=2, host_plan_cfg=cfg,
                      cache_dir=cache_dir, prefetch=0, **kw)


def test_cached_batches_bitexact_and_slim_records(tmp_path):
    from segdino3d_tpu.data.collate import eval_annotation

    fresh = list(_loader())
    cache_dir = str(tmp_path / "evc")

    built = list(_loader(cache_dir))           # first pass: build + persist
    served = list(_loader(cache_dir))          # second loader: cache only

    assert len(fresh) == len(built) == len(served)
    for (fr, fb), (_, bb), (sr, sb) in zip(fresh, built, served):
        # numpy-leaf build == device-leaf build == mmap-served, bit-exact
        _assert_tree_bitexact(
            np.asarray(fb.points), np.asarray(bb.points))
        import jax
        fb_np = jax.tree_util.tree_map(np.asarray, fb)
        _assert_tree_bitexact(fb_np, bb)
        _assert_tree_bitexact(fb_np, sb)
        # slim records: exactly what the eval driver consumes
        for rec, slim in zip(fr, sr):
            assert slim["n_points"] == rec["points"].shape[0]
            ann_full = eval_annotation(rec)
            ann_slim = eval_annotation(slim)
            for k in ("pts_instance_mask", "pts_semantic_mask"):
                assert np.array_equal(ann_full[k], ann_slim[k])
            assert ann_full["lidar_idx"] == ann_slim["lidar_idx"]


def test_cache_namespace_rotates_on_config_change(tmp_path):
    cache_dir = str(tmp_path / "evc")
    list(_loader(cache_dir))                    # populate
    ld_same = _loader(cache_dir)
    assert ld_same._cache().complete()
    # a different plan config must NOT serve the old namespace
    from segdino3d_tpu.data.collate import PadSpec
    from segdino3d_tpu.data.loader import EvalLoader

    ld_other = EvalLoader(_DS(), PadSpec(1024, 32, 8, 8, 8), batch_size=2,
                          host_plan_cfg=dict(voxel_size=0.02,
                                             voxel_cap=4096),
                          cache_dir=cache_dir, prefetch=0)
    assert not ld_other._cache().complete()
    assert ld_other._cache().key != ld_same._cache().key


def test_incomplete_cache_rebuilds(tmp_path):
    cache_dir = str(tmp_path / "evc")
    ld = _loader(cache_dir)
    it = iter(ld)
    next(it)                                    # abandon mid-build
    del it
    ld2 = _loader(cache_dir)
    assert not ld2._cache().complete()          # no manifest -> rebuild
    n = len(list(ld2))
    assert n == len(ld2)
    assert _loader(cache_dir)._cache().complete()
