"""Config-driven model assembly.

Mirrors the reference's registry build flow
(``/root/reference/train_3d.py:141`` -> ``segdino3d/builder.py:43-45`` ->
``Baseline3D.__init__`` building backbone/decoder/criterion from config
dicts), keeping the same config schema (``pointcloud_backbone_cfg``,
``decoder_cfg``, ``criterion_cfg``, ``test_cfg`` ...) so reference-style
config files port over unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

from segdino3d_tpu.registry import ARCHITECTURES, BACKBONES, DECODERS, LOSSES
from segdino3d_tpu.models.architecture.segdino3d import SegDINO3D
from segdino3d_tpu.models.backbone.res16unet import Res16UNet34C
from segdino3d_tpu.models.backbone.spconv_unet import SpConvUNet
from segdino3d_tpu.models.backbone.wrapper import SparseBackboneWrapper
from segdino3d_tpu.models.decoder.query_decoder import ScanNetQueryDecoder
from segdino3d_tpu.models.criterion.losses import ScanNetUnifiedCriterion


@dataclass(frozen=True)
class Capacities:
    """Static shape capacities (padding buckets) for compilation."""
    num_points: int = 262144
    num_voxels: Optional[int] = 131072
    num_superpoints: int = 2048
    num_instances: int = 256
    num_queries2d: int = 256
    level_cap_ratios: Optional[tuple] = None  # host-plan level caps

    @staticmethod
    def from_cfg(cfg: Optional[Dict]) -> "Capacities":
        if cfg is None:
            return Capacities()
        return Capacities(**{k: v for k, v in cfg.items()
                             if k in Capacities.__dataclass_fields__})


def build_backbone_wrapper(cfg: Dict, caps: Capacities) -> SparseBackboneWrapper:
    cfg = dict(cfg)
    btype = cfg.pop("type")
    voxel_size = cfg.pop("voxel_size", 0.02)
    mode_fuse = cfg.pop("mode_fuse_2d_feat", "early_fusion")
    compute_dtype = cfg.pop("compute_dtype", "float32")
    cfg.pop("add_positional_embedding", None)
    cfg.pop("block_edges", None)         # loader-side layout knobs (host
    cfg.pop("block_edges_train", None)   # plans); params are layout-free
    cfg.pop("stem_gather", None)
    remat = cfg.pop("use_activation_checkpoint", False)
    if btype == "Res16UNet34C":
        unet = Res16UNet34C(
            in_channels=cfg.pop("in_channels", 259),
            out_channels=cfg.pop("out_channels", 96),
            remat=remat,
            config=dict(cfg.pop("config", {})))
        stem_kernel = unet.config.get("conv1_kernel_size", 5)
        include_centered = False
    elif btype == "SpConvUNet":
        unet = SpConvUNet(
            num_planes=tuple(cfg.pop("num_planes", (32, 64, 96, 128, 160))),
            block_reps=cfg.pop("block_reps", 2),
            in_channels=cfg.pop("in_channels", 262),
            bn_momentum=cfg.pop("bn_momentum", 0.1))
        stem_kernel = 3
        include_centered = True
    else:
        raise KeyError(f"unknown backbone type {btype}")
    return SparseBackboneWrapper(
        unet=unet,
        voxel_size=voxel_size,
        s_cap=caps.num_superpoints,
        voxel_cap=caps.num_voxels,
        stem_kernel=stem_kernel,
        mode_fuse_2d_feat=mode_fuse,
        include_centered_xyz=include_centered,
        # spconv path quantizes (p - p.min)/voxel — see wrapper docstring
        exact_min_shift=include_centered,
        compute_dtype=compute_dtype,
    )


def build_model(model_cfg: Dict, caps: Capacities):
    """Returns (SegDINO3D module, criterion, test_cfg dict)."""
    cfg = dict(model_cfg)
    assert cfg.pop("type", "Baseline3D") in ("Baseline3D", "SegDINO3D")
    backbone_cfg = dict(cfg["pointcloud_backbone_cfg"])
    voxel_size = backbone_cfg.get("voxel_size", 0.02)
    backbone = build_backbone_wrapper(backbone_cfg, caps)

    dec_cfg = dict(cfg["decoder_cfg"])
    dec_cfg.pop("type", None)
    known = set(ScanNetQueryDecoder.__dataclass_fields__)
    dec_kwargs = {k: v for k, v in dec_cfg.items() if k in known}
    decoder = ScanNetQueryDecoder(**dec_kwargs)

    criterion = None
    if cfg.get("criterion_cfg") is not None:
        ccfg = dict(cfg["criterion_cfg"])
        ccfg.pop("type", None)
        criterion = ScanNetUnifiedCriterion(**ccfg)

    model = SegDINO3D(
        backbone=backbone,
        decoder=decoder,
        num_classes=cfg.get("num_classes", 198),
        query_thr=cfg.get("query_thr", 0.5),
        query_num=cfg.get("query_num", -1),
        mode_3d_center=cfg.get("mode_3d_center", "median"),
        voxel_size=voxel_size,
        add_positional_embedding=cfg.get("add_positional_embedding", True),
    )
    test_cfg = dict(cfg.get("test_cfg", {}))
    return model, criterion, test_cfg
