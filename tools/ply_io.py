"""Minimal PLY mesh reader/writer (numpy, no third-party deps).

Supports the binary-little-endian and ascii PLY flavors that ScanNet ships
(``*_vh_clean_2.ply``: x/y/z float + red/green/blue uchar (+alpha), face
vertex_indices).  Offline-prep counterpart of the reference's
``plyfile``-based readers (``/root/reference/data/scannet/scannet_utils.py``).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_DTYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Returns dict with 'vertices' (N,3) f32, optional 'colors' (N,3) u8,
    'faces' (M,3) i32."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        assert line == b"ply", "not a PLY file"
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype) | ('list', ...)])
        cur = None
        while True:
            line = f.readline().strip().decode()
            if line.startswith("comment"):
                continue
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                cur = (name, int(cnt), [])
                elements.append(cur)
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    cur[2].append(("list", _DTYPES[parts[2]],
                                   _DTYPES[parts[3]], parts[4]))
                else:
                    cur[2].append((parts[2], _DTYPES[parts[1]]))
            elif line == "end_header":
                break

        out: Dict[str, np.ndarray] = {}
        for name, cnt, props in elements:
            if all(p[0] != "list" for p in props):
                dt = np.dtype([(p[0], "<" + p[1]) for p in props])
                if fmt == "ascii":
                    rows = [tuple(f.readline().split()) for _ in range(cnt)]
                    arr = np.array(rows, dtype=dt)
                else:
                    arr = np.frombuffer(f.read(cnt * dt.itemsize), dtype=dt)
                if name == "vertex":
                    out["vertices"] = np.stack(
                        [arr["x"], arr["y"], arr["z"]], 1).astype(np.float32)
                    if "red" in dt.names:
                        out["colors"] = np.stack(
                            [arr["red"], arr["green"], arr["blue"]], 1)
                    if "label" in dt.names:
                        out["labels"] = arr["label"].astype(np.int64)
            else:
                # list property (faces)
                faces = []
                if fmt == "ascii":
                    for _ in range(cnt):
                        vals = f.readline().split()
                        k = int(vals[0])
                        faces.append([int(v) for v in vals[1:1 + k]])
                else:
                    cnt_dt = np.dtype("<" + props[0][1])
                    idx_dt = np.dtype("<" + props[0][2])
                    for _ in range(cnt):
                        k = int(np.frombuffer(f.read(cnt_dt.itemsize),
                                              cnt_dt)[0])
                        faces.append(np.frombuffer(
                            f.read(k * idx_dt.itemsize), idx_dt))
                out["faces"] = np.asarray(faces, np.int32)
    return out


def write_ply(path: str, vertices: np.ndarray, faces=None, colors=None):
    n = len(vertices)
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {n}",
               "property float x", "property float y", "property float z"]
        if colors is not None:
            hdr += ["property uchar red", "property uchar green",
                    "property uchar blue"]
        if faces is not None:
            hdr += [f"element face {len(faces)}",
                    "property list uchar int vertex_indices"]
        hdr.append("end_header")
        f.write(("\n".join(hdr) + "\n").encode())
        if colors is not None:
            dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                           ("r", "u1"), ("g", "u1"), ("b", "u1")])
            arr = np.empty(n, dt)
            arr["x"], arr["y"], arr["z"] = vertices.T.astype(np.float32)
            arr["r"], arr["g"], arr["b"] = np.asarray(colors).T
        else:
            dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
            arr = np.empty(n, dt)
            arr["x"], arr["y"], arr["z"] = vertices.T.astype(np.float32)
        f.write(arr.tobytes())
        if faces is not None:
            fdt = np.dtype([("k", "u1"), ("a", "<i4"), ("b", "<i4"),
                            ("c", "<i4")])
            farr = np.empty(len(faces), fdt)
            farr["k"] = 3
            farr["a"], farr["b"], farr["c"] = np.asarray(faces, np.int32).T
            f.write(farr.tobytes())
