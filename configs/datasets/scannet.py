# ScanNet v2 (20-class) dataset fragment.

scannet_train_mask = dict(
    type="ScanNetInstanceSeg3D",
    scene_set="train",
    root_scenes="data/scannet",
    use_super_points=True,
    root_points_2dfeats="data/features_2d/scannet",
    dropout_rate_2dfeats=0.1,
    transform_cfg=dict(type="Scannet200Transforms", voxel_size=0.02),
    mode_fuse_multi_scale_2d_feats="mean",
    dataset_type="scannet_train_mask3d",
)

scannet_val_mask = dict(
    type="ScanNetInstanceSeg3D",
    scene_set="val",
    root_scenes="data/scannet",
    use_super_points=True,
    root_points_2dfeats="data/features_2d/scannet",
    transform_cfg=dict(type="Scannet200Transforms", voxel_size=0.02),
    mode_fuse_multi_scale_2d_feats="mean",
    dataset_type="scannet_val_mask3d",
)
