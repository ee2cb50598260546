"""Debug point-cloud utils: parity vs the executed reference pc_util
(rotations, sampling semantics, bbox math) + PLY round-trips for the
mesh writers (the reference's trimesh path is stubbed here, so the
writers are validated geometrically instead)."""
import sys

import numpy as np
import pytest

from reference_import import load_reference_modules
from segdino3d_tpu.utils import pc_debug as pcd


def _ref_pc_util():
    ref = load_reference_modules()
    if ref is None:
        pytest.skip("reference/torch unavailable")
    return sys.modules["segdino3d.models.module.pc_util"]


def test_rotation_matrices_match_reference():
    ref = _ref_pc_util()
    for t in (-1.2, 0.0, 0.3, 2.9):
        np.testing.assert_allclose(pcd.roty(t), ref.roty(t), atol=1e-12)
        np.testing.assert_allclose(pcd.rotz(t), ref.rotz(t), atol=1e-12)
    t = np.array([[0.1, -0.5], [2.0, 3.1]])
    np.testing.assert_allclose(pcd.roty_batch(t), ref.roty_batch(t),
                               atol=1e-12)


def test_rotate_point_cloud_matches_reference_given_matrix():
    ref = _ref_pc_util()
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3))
    R = pcd.rotz(0.7)
    ours, _ = pcd.rotate_point_cloud(pts.copy(), rotation_matrix=R)
    theirs, _ = ref.rotate_point_cloud(pts.copy(), rotation_matrix=R)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_rotate_pc_along_y_matches_reference():
    ref = _ref_pc_util()
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(40, 6))
    np.testing.assert_allclose(
        pcd.rotate_pc_along_y(pts.copy(), 0.9),
        ref.rotate_pc_along_y(pts.copy(), 0.9), atol=1e-12)


def test_point_cloud_to_bbox_matches_reference():
    ref = _ref_pc_util()
    rng = np.random.default_rng(2)
    single = rng.normal(size=(30, 3))
    batch = rng.normal(size=(4, 30, 3))
    np.testing.assert_allclose(pcd.point_cloud_to_bbox(single),
                               ref.point_cloud_to_bbox(single))
    np.testing.assert_allclose(pcd.point_cloud_to_bbox(batch),
                               ref.point_cloud_to_bbox(batch))


def test_random_sampling_semantics():
    rng = np.random.default_rng(3)
    pc = rng.normal(size=(20, 4))
    out, idx = pcd.random_sampling(pc, 8, return_choices=True,
                                   rng=np.random.default_rng(4))
    assert out.shape == (8, 4)
    assert len(set(idx.tolist())) == 8  # without replacement when N>=k
    np.testing.assert_array_equal(out, pc[idx])
    big = pcd.random_sampling(pc, 50, rng=np.random.default_rng(5))
    assert big.shape == (50, 4)  # with replacement when N<k


def _read_back(path):
    sys.path.insert(0, ".")
    from tools.ply_io import read_ply
    return read_ply(str(path))


def test_write_bbox_roundtrip(tmp_path):
    box = np.array([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0]])
    path = tmp_path / "b.ply"
    pcd.write_bbox(box, str(path))
    d = _read_back(path)
    v = d["vertices"]
    assert v.shape == (8, 3) and d["faces"].shape == (12, 3)
    np.testing.assert_allclose(v.min(0), [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(v.max(0), [2.0, 4.0, 6.0], atol=1e-6)


def test_write_oriented_bbox_rotates_and_colors(tmp_path):
    # 90-degree yaw swaps the x/y extents
    box = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 1.0, np.pi / 2]])
    path = tmp_path / "ob.ply"
    pcd.write_oriented_bbox(box, str(path), colors=np.array([255, 0, 0]))
    d = _read_back(path)
    v = d["vertices"]
    ext = v.max(0) - v.min(0)
    np.testing.assert_allclose(ext, [4.0, 2.0, 1.0], atol=1e-5)
    assert (d["colors"][:, 0] == 255).all()
    assert (d["colors"][:, 1] == 0).all()


def test_write_oriented_bbox_camera_coord(tmp_path):
    # 90-degree Y heading swaps the x/z extents
    box = np.array([[0.0, 0.0, 0.0, 2.0, 1.0, 6.0, np.pi / 2]])
    path = tmp_path / "obc.ply"
    pcd.write_oriented_bbox_camera_coord(box, str(path))
    d = _read_back(path)
    v = d["vertices"]
    np.testing.assert_allclose(v.max(0) - v.min(0), [6.0, 1.0, 2.0],
                               atol=1e-5)


def test_write_lines_as_cylinders(tmp_path):
    pairs = np.array([[[0.0, 0.0, 0.0], [0.0, 0.0, 2.0]]])
    base = tmp_path / "lines"
    pcd.write_lines_as_cylinders(pairs, str(base), rad=0.1, res=16)
    d = _read_back(str(base) + ".ply")
    v = d["vertices"]
    assert v.shape == (16 * 2 + 2, 3)
    np.testing.assert_allclose(v[:, 2].min(), 0.0, atol=1e-6)
    np.testing.assert_allclose(v[:, 2].max(), 2.0, atol=1e-6)
    r = np.linalg.norm(v[:32, :2], axis=1)
    np.testing.assert_allclose(r, 0.1, atol=1e-6)
