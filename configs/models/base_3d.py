# Base model fragment for ScanNet200 instance segmentation.
# Schema-compatible with the reference framework's model configs
# (cfg.model.{pointcloud_backbone_cfg, decoder_cfg, criterion_cfg, test_cfg}).

num_instance_classes = 198   # things only (stuff excluded)
num_semantic_classes = 200   # full label space for semantic/panoptic heads

model = dict(
    type="SegDINO3D",
    num_classes=num_instance_classes,
    query_thr=0.5,
    mode_3d_center="median",
    add_positional_embedding=True,
    filter_outofbox_points_eval=True,
    pointcloud_backbone_cfg=dict(
        type="Res16UNet34C",
        # block-dense submanifold convs (ops.block_dense): per-level tile
        # edges, 0 = gather path. The TPU-optimal layout measured on v5e;
        # remove for CPU debugging (XLA CPU 3D convs are slow).
        # eval/inference: hybrid level-0 — gather-GEMM stem (the dense k5
        # stem pays ~50ms of 259-ch halo traffic) + block-dense e4 MXU
        # convs everywhere else (ResNet-block dense cost is ~half the
        # row-gather cost). Measured v5e ladder: e4-everywhere 103ms,
        # L0-gather 94ms, hybrid fastest.
        block_edges=(4, 4, 4, 4, 4),
        stem_gather=True,
        # training: e4 blocks everywhere, dense stem — the gather path's
        # backward is scatter-adds into the voxel table (measured ~2x
        # step cost).
        block_edges_train=(4, 4, 4, 4, 4),
        in_channels=256 + 3,
        out_channels=96,
        voxel_size=0.02,
        mode_fuse_2d_feat="early_fusion",
        add_positional_embedding=True,
        config=dict(
            dilations=[1, 1, 1, 1],
            conv1_kernel_size=5,
            bn_momentum=0.02,
        ),
    ),
    decoder_cfg=dict(
        type="ScanNetQueryDecoder",
        num_layers=6,
        num_instance_queries=0,
        num_semantic_queries=0,
        num_instance_classes=num_instance_classes,
        num_semantic_classes=num_semantic_classes,
        num_semantic_linears=1,
        in_channels=96,
        d_model=256,
        num_heads=8,
        hidden_dim=1024,
        dropout=0.0,
        activation_fn="gelu",
        iter_pred=True,
        attn_mask=True,
        fix_attention=True,
        objectness_flag=False,
        # SegDINO3D: object-level 2D feature cross-attention
        add_dinox_query_ca=True,
        add_dinox_query_ca_mask=True,
        dinox_query_ca_mask_threshold=0.2,
        # DAB-style positional pipeline
        add_positional_embedding=True,
        pos_type="sine",
        temperature=20,
        add_box_size_pred=True,
        box_modulate_ca=True,
        normalize_box_prediction=True,
    ),
    criterion_cfg=dict(
        type="ScanNetUnifiedCriterion",
        num_semantic_classes=num_semantic_classes,
        sem_criterion=dict(
            type="ScanNetSemanticCriterion",
            ignore_index=num_semantic_classes,
            loss_weight=0.5,
        ),
        inst_criterion=dict(
            type="InstanceCriterion",
            matcher=dict(
                type="SparseMatcher",
                topk=1,
                costs=[
                    dict(type="QueryClassificationCost", weight=0.5),
                    dict(type="MaskBCECost", weight=1.0),
                    dict(type="MaskDiceCost", weight=1.0),
                    dict(type="CenterL1Cost", weight=0.5),
                    dict(type="SizeL1Cost", weight=0.5),
                ],
            ),
            loss_weight=[0.5, 1.0, 1.0, 0.5, 0.5, 0.5],
            num_classes=num_instance_classes,
            non_object_weight=0.1,
            fix_dice_loss_weight=True,
            iter_matcher=True,
            fix_mean_loss=True,
        ),
    ),
    test_cfg=dict(
        topk_insts=600,
        inst_score_thr=0.0,
        pan_score_thr=0.5,
        npoint_thr=100,
        obj_normalization=True,
        sp_score_thr=0.4,
        nms=True,
        matrix_nms_kernel="linear",
        stuff_classes=[0, 1],
    ),
)

# Static padding capacities for XLA compilation (TPU-specific; no reference
# equivalent — the reference uses ragged tensors).
capacities = dict(
    num_points=262144,
    num_voxels=131072,
    num_superpoints=2048,
    num_instances=256,
    num_queries2d=256,
)
