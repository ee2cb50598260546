"""Benchmark submission writers: byte-exact golden-fixture tests.

The ScanNet benchmark's hidden-test interchange format is defined by the
reference writers (``/root/reference/evaluation/evaluator_3d.py:351-396``):

* instance: per-scene ``<sid>.txt`` with one line per instance
  ``predicted_masks/<sid>_<i:03d>.txt <raw_class_id> <score:.4f>\\n``
  plus per-instance 0/1 mask files (one int per point per line);
* semantic: per-scene ``<sid>.txt`` with one raw class id per point line.

A silent format error costs a wasted benchmark submission, so these pin
the exact bytes.
"""
import os

import numpy as np

from segdino3d_tpu.evaluation.evaluator import InstanceSeg3DEvaluator


def _evaluator(tmp_path):
    return InstanceSeg3DEvaluator(
        # raw ids: stuff (wall=1, floor=2) first, things after —
        # mirrors scannet VALID_CLASS_IDS ordering
        valid_class_ids=[1, 2, 3, 4, 5, 6],
        class_names=["wall", "floor", "cabinet", "bed", "chair", "sofa"],
        stuff_class_inds=[0, 1],
        submission_prefix_instance=str(tmp_path / "inst"),
        submission_prefix_semantic=str(tmp_path / "sem"))


def test_format_results_instance_golden(tmp_path):
    ev = _evaluator(tmp_path)
    n_pts = 5
    pred = dict(
        pts_instance_masks=np.array([[1, 0, 1, 0, 0],
                                     [0, 1, 0, 0, 1]], bool),
        instance_labels=np.array([0, 3]),   # thing-class indices
        instance_scores=np.array([0.98765, 0.5]),
        pts_semantic_mask=np.zeros(n_pts, np.int64))
    ev.process({"lidar_idx": "scene0707_00"}, pred)
    ev.format_results_instance()

    root = str(tmp_path / "inst")
    with open(os.path.join(root, "scene0707_00.txt"), "rb") as f:
        content = f.read()
    # thing label 0 -> valid_class_ids[2 + 0] = 3; label 3 -> 6
    assert content == (
        b"predicted_masks/scene0707_00_000.txt 3 0.9877\n"
        b"predicted_masks/scene0707_00_001.txt 6 0.5000\n"), content

    with open(os.path.join(root, "predicted_masks",
                           "scene0707_00_000.txt"), "rb") as f:
        mask0 = f.read()
    assert mask0 == b"1\n0\n1\n0\n0\n", mask0
    with open(os.path.join(root, "predicted_masks",
                           "scene0707_00_001.txt"), "rb") as f:
        mask1 = f.read()
    assert mask1 == b"0\n1\n0\n0\n1\n", mask1


def test_format_results_semantic_golden(tmp_path):
    ev = _evaluator(tmp_path)
    pred = dict(
        pts_instance_masks=np.zeros((0, 4), bool),
        instance_labels=np.zeros((0,), np.int64),
        instance_scores=np.zeros((0,)),
        # semantic prediction indices over the FULL class list (stuff
        # included): wall, floor, cabinet, sofa
        pts_semantic_mask=np.array([0, 1, 2, 5], np.int64))
    ev.process({"lidar_idx": "scene0708_00"}, pred)
    ev.format_results_semantic()

    with open(str(tmp_path / "sem" / "scene0708_00.txt"), "rb") as f:
        content = f.read()
    # raw ids: 1, 2, 3, 6
    assert content == b"1\n2\n3\n6\n", content


def test_submission_multi_scene_files(tmp_path):
    """One summary file per scene; mask filenames keyed by scene id."""
    ev = _evaluator(tmp_path)
    for sid in ("scene0000_00", "scene0001_00"):
        ev.process({"lidar_idx": sid}, dict(
            pts_instance_masks=np.ones((1, 3), bool),
            instance_labels=np.array([1]),
            instance_scores=np.array([1.0]),
            pts_semantic_mask=np.zeros(3, np.int64)))
    ev.format_results_instance()
    root = str(tmp_path / "inst")
    assert sorted(os.listdir(os.path.join(root, "predicted_masks"))) == [
        "scene0000_00_000.txt", "scene0001_00_000.txt"]
    assert os.path.isfile(os.path.join(root, "scene0000_00.txt"))
    assert os.path.isfile(os.path.join(root, "scene0001_00.txt"))
