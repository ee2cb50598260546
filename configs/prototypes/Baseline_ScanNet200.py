# Baseline (no DINO-X feature injection) on ScanNet200: rgb-only backbone
# input and no object-level 2D query cross-attention.
_base_ = [
    "../datasets/scannet200.py",
    "../models/base_3d.py",
    "../schedules/adamw_polylr_3d.py",
]

voxel_size = 0.02

_base_.model.pointcloud_backbone_cfg.voxel_size = voxel_size
_base_.model.pointcloud_backbone_cfg.mode_fuse_2d_feat = "only_rgb"
_base_.model.pointcloud_backbone_cfg.in_channels = 3
_base_.model.decoder_cfg.add_dinox_query_ca = False
_base_.model.decoder_cfg.add_dinox_query_ca_mask = False

_base_.scannet200_train_mask.transform_cfg.voxel_size = voxel_size
_base_.scannet200_val_mask.transform_cfg.voxel_size = voxel_size
_base_.scannet200_train_mask.root_points_2dfeats = None
_base_.scannet200_val_mask.root_points_2dfeats = None

data = dict(
    train_main=[_base_.scannet200_train_mask],
    eval_main=[_base_.scannet200_val_mask],
    train_extras=None,
    train_batch_size=4,
    num_workers=8,
    # GIL-free batch builders + zero-copy shm result transport (loader.py)
    worker_mode="process",
    sync_scale=True,
)

evaluations = ["scannet200_instance_seg"]
evaluator_cfg = dict(
    dataset="scannet200",
    stuff_class_inds=[0, 1],
    min_num_points=1,
    id_offset=2 ** 16,
)

amp = False
use_ema = False
ema_decay = 0.9997
clip_max_norm = 10
num_iterations = 300 * 129
eval_step = 300 * 129
save_step = 300 * 4
print_freq = 10

_base_.scheduler.total_iters = num_iterations
