"""Point-cloud debug utils (reference pc_util.py:34-304 counterparts)."""
import numpy as np

from segdino3d_tpu.utils import pc_utils as U


def test_random_sampling_shapes_and_choices():
    rng = np.random.RandomState(0)
    pc = rng.randn(100, 6)
    out, ch = U.random_sampling(pc, 32, return_choices=True, rng=rng)
    assert out.shape == (32, 6)
    np.testing.assert_array_equal(out, pc[ch])
    # fewer points than requested -> replacement kicks in automatically
    out2 = U.random_sampling(pc[:8], 32, rng=rng)
    assert out2.shape == (32, 6)


def test_rotations_are_orthonormal_and_consistent():
    for mk, t in ((U.roty, 0.3), (U.rotz, -1.2)):
        R = mk(t)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0
    tb = np.array([0.1, 0.7, 2.0])
    Rb = U.roty_batch(tb)
    for i, t in enumerate(tb):
        np.testing.assert_allclose(Rb[i], U.roty(t), atol=1e-12)


def test_rotate_pc_along_y_matches_roty():
    rng = np.random.RandomState(1)
    pc = rng.randn(50, 3)
    got = U.rotate_pc_along_y(pc, 0.77)
    # reference semantics: rotate the (x, z) plane about +y
    ref = pc @ U.roty(-0.77).T   # roty convention vs 2d rot: check closure
    # consistency with rotate_point_cloud under the same matrix
    rot, R = U.rotate_point_cloud(pc, U.roty(0.77))
    assert got.shape == ref.shape == rot.shape
    # the (x,z) norm is preserved and y untouched
    np.testing.assert_allclose(got[:, 1], pc[:, 1])
    np.testing.assert_allclose(np.hypot(got[:, 0], got[:, 2]),
                               np.hypot(pc[:, 0], pc[:, 2]), atol=1e-12)


def test_point_cloud_to_bbox():
    pts = np.array([[0, 0, 0], [2, 4, 6.0]])
    box = U.point_cloud_to_bbox(pts)
    np.testing.assert_allclose(box, [1, 2, 3, 2, 4, 6])
    batch = np.stack([pts, pts + 1])
    np.testing.assert_allclose(U.point_cloud_to_bbox(batch)[1],
                               [2, 3, 4, 2, 4, 6])


def test_scale_points_batch():
    xyz = np.ones((2, 5, 3))
    out = U.scale_points(xyz, np.array([2.0, 3.0]))
    assert out[0, 0, 0] == 2.0 and out[1, 0, 0] == 3.0


def test_bbox_ply_roundtrip(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.ply_io import read_ply

    boxes = np.array([[0, 0, 0, 2, 2, 2], [5, 0, 0, 1, 1, 1.0]])
    p = str(tmp_path / "b.ply")
    U.write_bbox(boxes, p)
    mesh = read_ply(p)
    assert mesh["vertices"].shape == (16, 3)
    # first box spans [-1, 1]^3, second is centered at x=5
    assert np.allclose(np.abs(mesh["vertices"][:8]).max(), 1.0)
    assert np.allclose(mesh["vertices"][8:, 0].mean(), 5.0)

    ob = np.array([[0, 0, 0, 4, 2, 2, np.pi / 2]])
    p2 = str(tmp_path / "ob.ply")
    U.write_oriented_bbox(ob, p2, colors=np.array([255, 0, 0]))
    m2 = read_ply(p2)
    # yaw 90deg about z swaps the x/y extents
    ext = m2["vertices"].max(0) - m2["vertices"].min(0)
    np.testing.assert_allclose(ext, [2, 4, 2], atol=1e-6)

    U.write_oriented_bbox_camera_coord(
        np.array([[0, 0, 0, 4, 2, 2, np.pi / 2]]), str(tmp_path / "oc.ply"))
    m3 = read_ply(str(tmp_path / "oc.ply"))
    ext3 = m3["vertices"].max(0) - m3["vertices"].min(0)
    np.testing.assert_allclose(ext3, [2, 2, 4], atol=1e-6)  # y-yaw swaps x/z


def test_cylinders_ply(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.ply_io import read_ply

    segs = np.array([[[0, 0, 0], [0, 0, 1.0]], [[1, 0, 0], [2, 0, 0]]])
    p = str(tmp_path / "c.ply")
    U.write_lines_as_cylinders(segs, p, rad=0.01, res=8)
    m = read_ply(p)
    assert m["vertices"].shape == (2 * 2 * 8, 3)
    # first cylinder spans z in [0, 1] at radius ~0.01
    z0 = m["vertices"][:16]
    assert z0[:, 2].min() >= -1e-6 and z0[:, 2].max() <= 1 + 1e-6
    np.testing.assert_allclose(np.hypot(z0[:, 0], z0[:, 1]), 0.01, atol=1e-6)
