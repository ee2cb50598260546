# ScanNet200 dataset fragment (train + val readers).

scannet200_train_mask = dict(
    type="ScanNet200InstanceSeg3D",
    scene_set="train",
    root_scenes="data/scannet200",
    use_super_points=True,
    root_points_2dfeats="data/features_2d/scannet200",
    dropout_rate_2dfeats=0.0,  # prototypes override (0.7 for ScanNet200)
    transform_cfg=dict(type="Scannet200Transforms", voxel_size=0.02),
    mode_fuse_multi_scale_2d_feats="mean",
    dataset_type="scannet200_train_mask3d",
)

scannet200_val_mask = dict(
    type="ScanNet200InstanceSeg3D",
    scene_set="val",
    root_scenes="data/scannet200",
    use_super_points=True,
    root_points_2dfeats="data/features_2d/scannet200",
    transform_cfg=dict(type="Scannet200Transforms", voxel_size=0.02),
    mode_fuse_multi_scale_2d_feats="mean",
    dataset_type="scannet200_val_mask3d",
)
