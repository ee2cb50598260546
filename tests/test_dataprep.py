"""Offline prep pipeline test: synthetic raw scan -> .bin layout -> reader."""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def raw_scan(tmp_path_factory):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from ply_io import write_ply

    root = str(tmp_path_factory.mktemp("scans"))
    sid = "scene0000_00"
    sdir = os.path.join(root, sid)
    os.makedirs(sdir)
    # mesh: 12x12 grid floor
    nx = 12
    verts, faces = [], []
    for j in range(nx):
        for i in range(nx):
            verts.append([i * 0.1, j * 0.1, 0.0])
    for j in range(nx - 1):
        for i in range(nx - 1):
            a = j * nx + i
            faces.append([a, a + 1, a + nx])
            faces.append([a + 1, a + nx + 1, a + nx])
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    colors = np.full((len(verts), 3), 128, np.uint8)
    write_ply(os.path.join(sdir, f"{sid}_vh_clean_2.ply"), verts, faces, colors)

    # aggregation + segs: two objects covering halves
    seg_indices = [0 if v < len(verts) // 2 else 1 for v in range(len(verts))]
    with open(os.path.join(sdir, f"{sid}_vh_clean_2.0.010000.segs.json"), "w") as f:
        json.dump({"segIndices": seg_indices}, f)
    with open(os.path.join(sdir, f"{sid}.aggregation.json"), "w") as f:
        json.dump({"segGroups": [
            {"objectId": 0, "label": "chair", "segments": [0]},
            {"objectId": 1, "label": "table", "segments": [1]},
        ]}, f)
    with open(os.path.join(sdir, f"{sid}.txt"), "w") as f:
        f.write("axisAlignment = 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1\n")
    return root, sid


def test_export_scene(raw_scan, tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from prepare_scannet import export_scene

    scans_dir, sid = raw_scan
    out = str(tmp_path / "prep")
    assert export_scene(scans_dir, sid, out)
    pts = np.fromfile(os.path.join(out, "points", f"{sid}.bin"),
                      np.float32).reshape(-1, 6)
    inst = np.fromfile(os.path.join(out, "instance_mask", f"{sid}.bin"), np.int64)
    sp = np.fromfile(os.path.join(out, "super_points", f"{sid}.bin"), np.int64)
    assert pts.shape[0] == 144
    assert set(np.unique(inst)) == {0, 1}
    assert sp.shape == (144,)
    assert sp.min() >= 0
