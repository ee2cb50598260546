# SegDINO3D on ScanNet v2 (20 classes) — SpConvUNet backbone family.
_base_ = [
    "../datasets/scannet.py",
    "../models/base_3d.py",
    "../schedules/adamw_polylr_3d.py",
]

voxel_size = 0.02
num_instance_classes = 18
num_semantic_classes = 20

# SPFormer-style spconv U-Net replaces the Minkowski Res16UNet
_base_.model.num_classes = num_instance_classes
_base_.model.pointcloud_backbone_cfg = dict(
    type="SpConvUNet",
    num_planes=[32, 64, 96, 128, 160],
    block_reps=2,
    in_channels=256 + 6,   # rgb + centered-xyz + DINO-X
    voxel_size=voxel_size,
    mode_fuse_2d_feat="early_fusion",
    add_positional_embedding=True,
)
_base_.model.decoder_cfg.num_instance_classes = num_instance_classes
_base_.model.decoder_cfg.num_semantic_classes = num_semantic_classes
_base_.model.decoder_cfg.in_channels = 32
_base_.model.criterion_cfg.num_semantic_classes = num_semantic_classes
_base_.model.criterion_cfg.sem_criterion.ignore_index = num_semantic_classes
_base_.model.criterion_cfg.inst_criterion.num_classes = num_instance_classes

_base_.scannet_train_mask.transform_cfg.voxel_size = voxel_size
_base_.scannet_val_mask.transform_cfg.voxel_size = voxel_size

data = dict(
    train_main=[_base_.scannet_train_mask],
    eval_main=[_base_.scannet_val_mask],
    train_extras=None,
    train_batch_size=4,
    num_workers=8,
    # GIL-free batch builders + zero-copy shm result transport (loader.py)
    worker_mode="process",
    sync_scale=True,
)

evaluations = ["scannet_instance_seg"]
evaluator_cfg = dict(
    dataset="scannet",
    stuff_class_inds=[0, 1],
    min_num_points=1,
    id_offset=2 ** 16,
)

amp = False
use_ema = False
ema_decay = 0.9997
clip_max_norm = 10
num_iterations = 150000
eval_step = 150000
save_step = 2000
print_freq = 10

_base_.scheduler.total_iters = num_iterations
