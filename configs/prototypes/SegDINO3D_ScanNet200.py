# SegDINO3D on ScanNet200 — flagship config.
# Public schema mirrors the reference prototype (same top-level keys:
# model / data / evaluations / evaluator_cfg / num_iterations / ...).
_base_ = [
    "../datasets/scannet200.py",
    "../models/base_3d.py",
    "../schedules/adamw_polylr_3d.py",
]

voxel_size = 0.02

_base_.model.pointcloud_backbone_cfg.voxel_size = voxel_size
_base_.scannet200_train_mask.transform_cfg.voxel_size = voxel_size
_base_.scannet200_val_mask.transform_cfg.voxel_size = voxel_size
_base_.scannet200_train_mask.dropout_rate_2dfeats = 0.7

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

# optimization
amp = False                      # TPUs run bf16 natively; no GradScaler
use_ema = False
ema_decay = 0.9997
clip_max_norm = 10
num_iterations = 300 * 129
eval_step = 300 * 129
save_step = 300 * 4
print_freq = 10

_base_.scheduler.total_iters = num_iterations
