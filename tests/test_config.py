"""Config system tests: _base_ inheritance, overrides, model building."""
import os

import pytest

from segdino3d_tpu.builder import Capacities, build_model
from segdino3d_tpu.config.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROTOS = [
    "configs/prototypes/SegDINO3D_ScanNet200.py",
    "configs/prototypes/SegDINO3D_ScanNetv2.py",
    "configs/prototypes/Baseline_ScanNet200.py",
]


@pytest.mark.parametrize("proto", PROTOS)
def test_prototypes_load_and_build(proto):
    cfg = Config.fromfile(os.path.join(REPO, proto))
    model, criterion, test_cfg = build_model(cfg.model, Capacities())
    assert model is not None
    assert test_cfg["topk_insts"] == 600
    assert cfg.scheduler["total_iters"] == cfg.num_iterations
    assert cfg.data["train_batch_size"] == 4


def test_base_override_semantics(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("model = dict(a=1, nested=dict(x=1, y=2))\nlr = 0.1\n")
    child = tmp_path / "child.py"
    child.write_text(
        "_base_ = ['base.py']\n"
        "_base_.model.nested.x = 5\n"
        "extra = 'hi'\n")
    cfg = Config.fromfile(str(child))
    assert cfg.model["nested"]["x"] == 5
    assert cfg.model["nested"]["y"] == 2
    assert cfg.lr == 0.1
    assert cfg.extra == "hi"


def test_options_merge():
    cfg = Config.fromdict(dict(model=dict(lr=1.0), num_iterations=10))
    cfg.merge_from_options({"model.lr": 0.5, "num_iterations": 20,
                            "new.key": 3})
    assert cfg.model["lr"] == 0.5
    assert cfg.num_iterations == 20
    assert cfg.new["key"] == 3


def test_baseline_has_no_2d_branch():
    cfg = Config.fromfile(os.path.join(REPO, PROTOS[2]))
    assert cfg.model["decoder_cfg"]["add_dinox_query_ca"] is False
    assert cfg.model["pointcloud_backbone_cfg"]["in_channels"] == 3
    assert cfg.data["train_main"][0]["root_points_2dfeats"] is None
