"""Dataset reader tests: synthetic scenes written in the reference's on-disk
layout, read back through the real reader + transforms + collate."""
import numpy as np
import pytest

from segdino3d_tpu.data.collate import PadSpec, collate, eval_annotation
from segdino3d_tpu.data.scannet_dataset import ScanNet200InstanceSeg3D
from segdino3d_tpu.data.synthetic import synthetic_scene, write_scannet_layout


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scannet_layout"))
    write_scannet_layout(root, seeds=[0, 1], n_points=3000,
                         n_superpoints=48, n_classes=18, n_instances=5,
                         feat_dim_2d=16)
    return root


class TestReader:
    def test_val_read(self, data_root):
        import os
        ds = ScanNet200InstanceSeg3D(
            scene_set="val", root_scenes=data_root,
            use_super_points=True, adjust_class_ids=False,
            exclude_stuffs=False,
            root_points_2dfeats=os.path.join(data_root, "features_2d"))
        assert len(ds) == 2
        rec = ds.get_record(0, np.random.RandomState(0))
        ref = synthetic_scene(0, n_points=3000, n_superpoints=48,
                              n_classes=18, n_instances=5, feat_dim_2d=16)
        assert rec["points"].shape == (3000, 6)
        # color normalization applied; xyz untouched at val
        np.testing.assert_allclose(rec["points"][:, :3], ref["points"][:, :3],
                                   atol=1e-5)
        np.testing.assert_array_equal(rec["superpoint_ids"],
                                      ref["superpoint_ids"])
        np.testing.assert_array_equal(rec["semantic_masks"],
                                      ref["semantic_masks"])
        assert rec["points_2dfeats"].shape == (3000, 16)
        assert rec["query2d_feats"].shape[1] == 16

    def test_train_read_augment(self, data_root):
        import os
        ds = ScanNet200InstanceSeg3D(
            scene_set="train", root_scenes=data_root,
            use_super_points=True, adjust_class_ids=False,
            exclude_stuffs=False,
            root_points_2dfeats=os.path.join(data_root, "features_2d"),
            dropout_rate_2dfeats=0.5)
        rec = ds.get_record(0, np.random.RandomState(1))
        ref = synthetic_scene(0, n_points=3000, n_superpoints=48,
                              n_classes=18, n_instances=5, feat_dim_2d=16)
        # augmentation changed coordinates
        assert not np.allclose(rec["points"][:, :3], ref["points"][:, :3])
        # 2D query dropout: half kept
        assert rec["query2d_pos"].shape[0] == 6
        # elastic coordinates present (voxel units) or absent w.p. 0.5
        if rec["elastic_coords"] is not None:
            assert rec["elastic_coords"].shape == (3000, 3)

    def test_collate_and_eval_ann(self, data_root):
        import os
        ds = ScanNet200InstanceSeg3D(
            scene_set="val", root_scenes=data_root,
            use_super_points=True, adjust_class_ids=False,
            exclude_stuffs=False,
            root_points_2dfeats=os.path.join(data_root, "features_2d"))
        recs = [ds.get_record(i, np.random.RandomState(i)) for i in range(2)]
        spec = PadSpec.for_records(recs, num_semantic_classes=200,
                                   pt_multiple=1024, sp_multiple=16)
        batch = collate(recs, spec)
        assert batch.points.shape[0] == 2
        assert batch.point_valid[:, :3000].all()
        assert not batch.point_valid[:, 3000:].any()
        ann = eval_annotation(recs[0], bg_class_id=200)
        n_merged = ann["pts_instance_mask"].max() + 1
        # things + 2 stuff pseudo-instances
        assert n_merged >= 3
        assert (ann["pts_semantic_mask"][ann["pts_instance_mask"] == -1]
                == 200).all()


class TestSyncScale:
    def test_shared_scale(self, data_root):
        import os
        ds = ScanNet200InstanceSeg3D(
            scene_set="train", root_scenes=data_root,
            use_super_points=True, adjust_class_ids=False,
            exclude_stuffs=False,
            root_points_2dfeats=os.path.join(data_root, "features_2d"))
        r1 = ds.get_record(0, np.random.RandomState(0), sync_scale=1.17)
        r2 = ds.get_record(0, np.random.RandomState(0), sync_scale=0.85)
        # same rng, different shared scale -> coordinates scale accordingly
        ratio = np.abs(r1["points"][:, :3]).mean() / \
            np.abs(r2["points"][:, :3]).mean()
        assert 1.05 < ratio < 1.65
