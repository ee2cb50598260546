"""CLI integration: train a few iterations, checkpoint, eval --resume.

Exercises train_3d.py main() in-process on synthetic data written in the
reference's disk layout. Slow (compiles the full train graph on CPU).
"""
import os
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG_TMPL = '''
num_instance_classes = 16
num_semantic_classes = 18
model = dict(
    type="SegDINO3D", num_classes=num_instance_classes, query_thr=0.5,
    mode_3d_center="median", add_positional_embedding=True,
    filter_outofbox_points_eval=False,
    pointcloud_backbone_cfg=dict(
        type="Res16UNet34C", in_channels=16 + 3, out_channels=96,
        voxel_size=0.05, mode_fuse_2d_feat="early_fusion",
        config=dict(conv1_kernel_size=5, bn_momentum=0.1)),
    decoder_cfg=dict(
        type="ScanNetQueryDecoder", num_layers=1,
        num_instance_classes=num_instance_classes,
        num_semantic_classes=num_semantic_classes,
        in_channels=96, d_model=32, num_heads=4, hidden_dim=64,
        dropout=0.0, activation_fn="gelu", iter_pred=True, attn_mask=True,
        fix_attention=True, objectness_flag=False,
        add_dinox_query_ca=True, add_dinox_query_ca_mask=True,
        add_positional_embedding=True, pos_type="sine", temperature=20,
        add_box_size_pred=True, box_modulate_ca=True,
        normalize_box_prediction=True),
    criterion_cfg=dict(
        type="ScanNetUnifiedCriterion",
        num_semantic_classes=num_semantic_classes,
        sem_criterion=dict(type="ScanNetSemanticCriterion",
                           ignore_index=num_semantic_classes, loss_weight=0.5),
        inst_criterion=dict(
            type="InstanceCriterion",
            matcher=dict(type="SparseMatcher", topk=1, costs=[
                dict(type="QueryClassificationCost", weight=0.5),
                dict(type="MaskBCECost", weight=1.0),
                dict(type="MaskDiceCost", weight=1.0)]),
            loss_weight=[0.5, 1.0, 1.0, 0.5],
            num_classes=num_instance_classes, non_object_weight=0.1,
            fix_dice_loss_weight=True, iter_matcher=True, fix_mean_loss=True)),
    test_cfg=dict(topk_insts=32, inst_score_thr=0.0, pan_score_thr=0.5,
                  npoint_thr=10, obj_normalization=True, sp_score_thr=0.4,
                  nms=True, matrix_nms_kernel="linear", stuff_classes=[0, 1]),
)
capacities = dict(num_points=4096, num_voxels=8192, num_superpoints=64,
                  num_instances=16, num_queries2d=16,
                  level_cap_ratios=(1, 1, 1, 1, 1))
data = dict(
    train_main=[dict(
        type="ScanNet200InstanceSeg3D", scene_set="train",
        root_scenes="{root}", use_super_points=True, adjust_class_ids=False,
        exclude_stuffs=False, root_points_2dfeats="{root}/features_2d",
        num_semantic_classes=num_semantic_classes,
        transform_cfg=dict(type="Scannet200Transforms", voxel_size=0.05))],
    eval_main=[dict(
        type="ScanNet200InstanceSeg3D", scene_set="val",
        root_scenes="{root}", use_super_points=True, adjust_class_ids=False,
        exclude_stuffs=False, root_points_2dfeats="{root}/features_2d",
        num_semantic_classes=num_semantic_classes,
        transform_cfg=dict(type="Scannet200Transforms", voxel_size=0.05))],
    train_batch_size=2, num_workers=0, sync_scale=True)
evaluations = ["scannet200_instance_seg"]
evaluator_cfg = dict(stuff_class_inds=[0, 1])
optimizer = dict(type="AdamW", lr=1e-3, lr_backbone=1e-3, weight_decay=0.0)
scheduler = dict(type="PolyLR", total_iters=4, power=0.9)
use_ema = False
clip_max_norm = 10
num_iterations = 4
eval_step = None
save_step = 4
print_freq = 2
'''


# ScanNet v2 / SpConvUNet flagship variant (configs/prototypes/
# SegDINO3D_ScanNetv2.py shrunk to smoke scale): exercises the spconv
# recursive U-Net + v2 dataset + converter path end-to-end
CONFIG_TMPL_SPCONV = CONFIG_TMPL.replace(
    '''    pointcloud_backbone_cfg=dict(
        type="Res16UNet34C", in_channels=16 + 3, out_channels=96,
        voxel_size=0.05, mode_fuse_2d_feat="early_fusion",
        config=dict(conv1_kernel_size=5, bn_momentum=0.1)),''',
    '''    pointcloud_backbone_cfg=dict(
        type="SpConvUNet", num_planes=[16, 24, 32], block_reps=1,
        in_channels=16 + 6, voxel_size=0.05,
        mode_fuse_2d_feat="early_fusion",
        add_positional_embedding=True),''',
).replace(
    'in_channels=96, d_model=32', 'in_channels=16, d_model=32',
).replace('type="ScanNet200InstanceSeg3D"', 'type="ScanNetInstanceSeg3D"')


def test_cli_train_then_eval(tmp_path, monkeypatch):
    from segdino3d_tpu.data.synthetic import write_scannet_layout

    data_root = str(tmp_path / "data")
    write_scannet_layout(data_root, seeds=[0, 1, 2], n_points=2500,
                         n_superpoints=48, n_classes=16, n_instances=5,
                         feat_dim_2d=16)
    cfg_path = str(tmp_path / "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TMPL.replace("{root}", data_root))
    work = str(tmp_path / "work")

    import train_3d

    monkeypatch.setattr(sys, "argv", [
        "train_3d.py", "--config_file", cfg_path, "--work_dir", work,
        "--seed", "1"])
    train_3d.main()
    assert os.path.isdir(os.path.join(work, "checkpoints"))

    monkeypatch.setattr(sys, "argv", [
        "train_3d.py", "--config_file", cfg_path, "--work_dir", work,
        "--seed", "1", "--eval_only", "--resume", "--num_eval_scenes", "2"])
    train_3d.main()  # must not raise


def test_cli_train_accum_steps(tmp_path, monkeypatch):
    """--accum_steps 2: batch 2 runs as 2 scanned microbatches of 1 scene
    (the reference's bs=4 single-GPU recipe on memory-bound chips)."""
    from segdino3d_tpu.data.synthetic import write_scannet_layout

    data_root = str(tmp_path / "data")
    write_scannet_layout(data_root, seeds=[0, 1], n_points=2500,
                         n_superpoints=48, n_classes=16, n_instances=5,
                         feat_dim_2d=16)
    cfg_path = str(tmp_path / "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TMPL.replace("{root}", data_root)
                .replace("num_iterations = 4", "num_iterations = 2")
                .replace("save_step = 4", "save_step = 2"))
    work = str(tmp_path / "work")

    import train_3d

    monkeypatch.setattr(sys, "argv", [
        "train_3d.py", "--config_file", cfg_path, "--work_dir", work,
        "--seed", "1", "--accum_steps", "2"])
    train_3d.main()
    assert os.path.isdir(os.path.join(work, "checkpoints"))


def test_cli_pretrained_ckpt_restores_batch_stats(tmp_path, monkeypatch):
    """--load_pretrained_ckpt must apply BOTH converted params and BN
    running stats to the evaluated model (the reference's load_model
    restores stats through the state_dict, utils/ckpt_utils.py:85-113).

    Regression for the round-3 wiring bug where train_3d.py merged only
    params and eval ran BatchNorm on fresh (mean 0, var 1) statistics.
    Captured-variable equality against the independently converted tree
    implies the eval output equals a direct bridged-variables eval.
    """
    torch = pytest.importorskip("torch")
    import jax
    import numpy as np
    import jax.numpy as jnp

    from segdino3d_tpu.data.synthetic import write_scannet_layout
    from test_torch_roundtrip import build_res16_torch_sd, _flatten

    data_root = str(tmp_path / "data")
    write_scannet_layout(data_root, seeds=[0], n_points=2000,
                         n_superpoints=48, n_classes=16, n_instances=5,
                         feat_dim_2d=16)
    cfg_path = str(tmp_path / "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TMPL.replace("{root}", data_root))
    work = str(tmp_path / "work")

    # synthetic "pretrained backbone" torch checkpoint with known
    # converted values: inverse-construct it from the standalone unet
    # tree at the config's channels (structure matches the full model's
    # backbone/unet subtree)
    from segdino3d_tpu.models.backbone.res16unet import Res16UNet34C
    from segdino3d_tpu.ops.host_plan import (build_host_plan,
                                             host_plan_to_device)
    rng = np.random.RandomState(7)
    coords = rng.randint(0, 16, (200, 3)).astype(np.float32)
    plan = build_host_plan(coords, np.zeros(200, np.int32),
                           np.ones(200, bool), [256, 128, 64, 32, 16])
    uplan, _ = host_plan_to_device(plan)
    bb = Res16UNet34C(in_channels=19, out_channels=96)
    variables = bb.init(jax.random.PRNGKey(0),
                        jnp.zeros((256, 19), jnp.float32), uplan, False)
    want_p = _flatten(variables["params"])
    want_s = _flatten(variables["batch_stats"])
    sd = build_res16_torch_sd(want_p, want_s, rng)  # fills targets
    for k in want_s:   # running_var must be positive (sd aliases want_s)
        if k.endswith("/var"):
            np.abs(want_s[k], out=want_s[k])
    ckpt_path = str(tmp_path / "pretrained.pth")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v).copy())
                          for k, v in sd.items()}}, ckpt_path)

    # spy on the eval entry to capture the variables actually applied
    import segdino3d_tpu.evaluation.evaluate as eval_mod
    real_evaluate = eval_mod.evaluate
    captured = {}

    def spy(model, vs, *a, **kw):
        captured["variables"] = jax.device_get(vs)
        res = real_evaluate(model, vs, *a, **kw)
        captured["result"] = res
        return res

    monkeypatch.setattr(eval_mod, "evaluate", spy)

    import train_3d
    monkeypatch.setattr(sys, "argv", [
        "train_3d.py", "--config_file", cfg_path, "--work_dir", work,
        "--seed", "1", "--eval_only", "--num_eval_scenes", "1",
        "--load_pretrained_ckpt", ckpt_path])
    train_3d.main()

    assert captured.get("result") is not None
    got_p = _flatten(captured["variables"]["params"]["backbone"]["unet"])
    got_s = _flatten(captured["variables"]["batch_stats"]["backbone"]["unet"])
    assert set(got_p) == set(want_p)
    assert set(got_s) == set(want_s)
    for k, v in want_p.items():
        np.testing.assert_array_equal(got_p[k], v, err_msg=k)
    for k, v in want_s.items():
        np.testing.assert_array_equal(got_s[k], v, err_msg=k)
    # sanity: the converted stats are NOT fresh-init stats, so the old
    # params-only merge would have failed the assertions above
    fresh = _flatten(variables["batch_stats"])
    assert any(not np.allclose(want_s[k], fresh[k]) for k in want_s)


def test_cli_spconv_v2_train_eval(tmp_path, monkeypatch):
    """ScanNet v2 / SpConvUNet flagship config path (train 2 iters + eval)."""
    from segdino3d_tpu.data.synthetic import write_scannet_layout

    data_root = str(tmp_path / "data")
    write_scannet_layout(data_root, seeds=[0, 1], n_points=2000,
                         n_superpoints=48, n_classes=16, n_instances=5,
                         feat_dim_2d=16)
    cfg_path = str(tmp_path / "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TMPL_SPCONV.replace("{root}", data_root)
                .replace("num_iterations = 4", "num_iterations = 2"))
    work = str(tmp_path / "work")

    import train_3d

    monkeypatch.setattr(sys, "argv", [
        "train_3d.py", "--config_file", cfg_path, "--work_dir", work,
        "--seed", "1"])
    train_3d.main()
    monkeypatch.setattr(sys, "argv", [
        "train_3d.py", "--config_file", cfg_path, "--work_dir", work,
        "--seed", "1", "--eval_only", "--resume", "--num_eval_scenes", "2"])
    train_3d.main()  # must not raise
