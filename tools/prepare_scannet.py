"""Offline ScanNet data preparation: raw scans -> training .bin layout.

End-to-end equivalent of the reference's two-stage prep
(``/root/reference/data/scannet/batch_load_scannet_data.py`` +
``tools/create_data.py``, see SURVEY.md 搂3.4): for every scene

1. read ``<scene>_vh_clean_2.ply`` (mesh + color),
   ``<scene>_vh_clean_2.labels.ply`` (raw semantic labels) or the
   aggregation/segs json pair, and the axis-alignment matrix from
   ``<scene>.txt``;
2. axis-align vertices, build per-vertex semantic + instance ids;
3. compute superpoints with the native mesh segmentator
   (``native/segmentator``);
4. write ``points/{id}.bin`` (Nx6 f32 xyzrgb), ``instance_mask/{id}.bin``,
   ``semantic_mask/{id}.bin`` (int64), ``super_points/{id}.bin`` and the
   split lists under ``meta_data/``.

Usage:
    python tools/prepare_scannet.py --scans_dir <raw>/scans \
        --output_dir data/scannet200 [--num_workers 8] [--max_scenes N]
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ply_io import read_ply  # noqa: E402


def read_axis_align_matrix(meta_path: str):
    if not os.path.isfile(meta_path):
        return None
    with open(meta_path) as f:
        for line in f:
            if line.startswith("axisAlignment"):
                vals = [float(x) for x in line.split("=")[1].split()]
                return np.asarray(vals, np.float64).reshape(4, 4)
    return None


def read_label_map(tsv_path: str, label_from="raw_category", label_to="id"):
    """ScanNet ``scannetv2-labels.combined.tsv`` reader (reference
    ``scannet_utils.py:33-51``)."""
    import csv

    mapping = {}
    with open(tsv_path) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            try:
                mapping[row[label_from]] = int(row[label_to])
            except ValueError:
                mapping[row[label_from]] = 0
    return mapping


def export_scene(scans_dir: str, scene_id: str, output_dir: str,
                 label_map_path=None) -> bool:
    sdir = os.path.join(scans_dir, scene_id)
    mesh_p = os.path.join(sdir, f"{scene_id}_vh_clean_2.ply")
    agg_p = os.path.join(sdir, f"{scene_id}.aggregation.json")
    seg_p = os.path.join(sdir, f"{scene_id}_vh_clean_2.0.010000.segs.json")
    meta_p = os.path.join(sdir, f"{scene_id}.txt")
    if not os.path.isfile(mesh_p):
        return False

    mesh = read_ply(mesh_p)
    verts = mesh["vertices"].astype(np.float64)
    colors = mesh.get("colors", np.zeros((len(verts), 3), np.uint8))
    faces = mesh["faces"]

    # axis align
    m = read_axis_align_matrix(meta_p)
    if m is not None:
        hom = np.concatenate([verts, np.ones((len(verts), 1))], 1)
        verts = (hom @ m.T)[:, :3]

    n = len(verts)
    sem = np.zeros(n, np.int64)
    inst = np.full(n, -1, np.int64)

    # semantic from labels.ply when present, else via aggregation+segs+tsv
    labels_p = os.path.join(sdir, f"{scene_id}_vh_clean_2.labels.ply")
    if os.path.isfile(labels_p):
        sem = read_ply(labels_p).get("labels", sem).astype(np.int64)

    if os.path.isfile(agg_p) and os.path.isfile(seg_p):
        with open(seg_p) as f:
            seg_to_verts = {}
            seg_indices = json.load(f)["segIndices"]
            for vi, s in enumerate(seg_indices):
                seg_to_verts.setdefault(s, []).append(vi)
        label_map = (read_label_map(label_map_path)
                     if label_map_path else None)
        with open(agg_p) as f:
            for obj in json.load(f)["segGroups"]:
                obj_id = obj["objectId"]
                for s in obj["segments"]:
                    for vi in seg_to_verts.get(s, ()):
                        inst[vi] = obj_id
                if label_map is not None:
                    raw = label_map.get(obj["label"], 0)
                    for s in obj["segments"]:
                        for vi in seg_to_verts.get(s, ()):
                            sem[vi] = raw

    # superpoints via the native graph-cut segmentator
    from segdino3d_tpu.data.segmentator import segment_mesh
    sp = segment_mesh(verts.astype(np.float32), faces)

    pts = np.concatenate(
        [verts.astype(np.float32), colors.astype(np.float32)], 1)
    for sub in ("points", "instance_mask", "semantic_mask", "super_points"):
        os.makedirs(os.path.join(output_dir, sub), exist_ok=True)
    pts.astype(np.float32).tofile(
        os.path.join(output_dir, "points", f"{scene_id}.bin"))
    inst.tofile(os.path.join(output_dir, "instance_mask", f"{scene_id}.bin"))
    sem.tofile(os.path.join(output_dir, "semantic_mask", f"{scene_id}.bin"))
    sp.tofile(os.path.join(output_dir, "super_points", f"{scene_id}.bin"))
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scans_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--label_map", default=None,
                   help="scannetv2-labels.combined.tsv path")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--max_scenes", type=int, default=None)
    p.add_argument("--splits_dir", default=None,
                   help="dir with scannetv2_{train,val,test}.txt lists")
    args = p.parse_args()

    scenes = sorted(d for d in os.listdir(args.scans_dir)
                    if os.path.isdir(os.path.join(args.scans_dir, d)))
    if args.max_scenes:
        scenes = scenes[: args.max_scenes]

    jobs = [(args.scans_dir, s, args.output_dir, args.label_map)
            for s in scenes]
    if args.num_workers > 1:
        with mp.Pool(args.num_workers) as pool:
            ok = pool.starmap(export_scene, jobs)
    else:
        ok = [export_scene(*j) for j in jobs]
    print(f"exported {sum(ok)}/{len(scenes)} scenes")

    meta = os.path.join(args.output_dir, "meta_data")
    os.makedirs(meta, exist_ok=True)
    if args.splits_dir:
        import shutil
        for split in ("train", "val", "test"):
            src = os.path.join(args.splits_dir, f"scannetv2_{split}.txt")
            if os.path.isfile(src):
                shutil.copy(src, meta)
    else:
        with open(os.path.join(meta, "scannetv2_train.txt"), "w") as f:
            f.write("\n".join(s for s, o in zip(scenes, ok) if o))


if __name__ == "__main__":
    main()
