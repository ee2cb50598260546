"""Native segmentator tests (builds the C++ lib on first run)."""
import numpy as np
import pytest

from segdino3d_tpu.data.segmentator import segment_mesh


def grid_patch(nx, ny, origin, normal_dir="z", spacing=0.1):
    """A flat triangulated grid patch."""
    verts = []
    for j in range(ny):
        for i in range(nx):
            if normal_dir == "z":
                verts.append([origin[0] + i * spacing,
                              origin[1] + j * spacing, origin[2]])
            else:  # x-facing wall
                verts.append([origin[0],
                              origin[1] + i * spacing, origin[2] + j * spacing])
    faces = []
    for j in range(ny - 1):
        for i in range(nx - 1):
            a = j * nx + i
            faces.append([a, a + 1, a + nx])
            faces.append([a + 1, a + nx + 1, a + nx])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


class TestSegmentator:
    def test_two_orthogonal_planes(self):
        v1, f1 = grid_patch(12, 12, (0, 0, 0), "z")
        v2, f2 = grid_patch(12, 12, (0, 0, 0), "x")
        # weld the shared edge (y axis at x=0,z=0): offset second patch ids
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + len(v1)])
        labels = segment_mesh(verts, faces, kthr=0.01, seg_min_verts=5)
        assert labels.shape == (len(verts),)
        # each flat patch must be one coherent segment
        assert len(np.unique(labels[: len(v1)])) == 1
        assert len(np.unique(labels[len(v1):])) == 1
        # and they must differ (normals orthogonal)
        assert labels[0] != labels[len(v1)]

    def test_min_verts_merge(self):
        v, f = grid_patch(20, 20, (0, 0, 0), "z")
        labels = segment_mesh(v, f, kthr=0.01, seg_min_verts=10)
        # one flat sheet -> single segment
        assert len(np.unique(labels)) == 1

    def test_labels_compact(self):
        v1, f1 = grid_patch(8, 8, (0, 0, 0), "z")
        v2, f2 = grid_patch(8, 8, (5, 0, 0), "x")  # disconnected
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + len(v1)])
        labels = segment_mesh(verts, faces, seg_min_verts=4)
        u = np.unique(labels)
        np.testing.assert_array_equal(u, np.arange(len(u)))
