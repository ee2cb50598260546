"""Synthetic indoor-scene generator.

Produces records with the same schema as the ScanNet readers — used by the
test suite and the benchmark harness (no ScanNet download in CI), and able
to write the reference's on-disk ``.bin``/``.pth`` layout so the real reader
path is exercised end-to-end.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def synthetic_scene(seed: int = 0,
                    n_points: int = 20000,
                    n_instances: int = 8,
                    n_superpoints: int = 96,
                    n_classes: int = 18,
                    n_stuff: int = 2,
                    n_queries2d: int = 12,
                    feat_dim_2d: int = 256,
                    extent: float = 6.0) -> Dict:
    """A room: floor/wall 'stuff' + blob instances, superpoints by grid."""
    rng = np.random.RandomState(seed)
    pts = np.zeros((n_points, 6), np.float32)

    # stuff: floor (z~0) and wall (y~0)
    n_floor = n_points // 4
    n_wall = n_points // 8
    n_things = n_points - n_floor - n_wall
    pts[:n_floor, 0] = rng.uniform(0, extent, n_floor)
    pts[:n_floor, 1] = rng.uniform(0, extent, n_floor)
    pts[:n_floor, 2] = rng.uniform(0, 0.05, n_floor)
    pts[n_floor:n_floor + n_wall, 0] = rng.uniform(0, extent, n_wall)
    pts[n_floor:n_floor + n_wall, 1] = rng.uniform(0, 0.05, n_wall)
    pts[n_floor:n_floor + n_wall, 2] = rng.uniform(0, 2.5, n_wall)

    sem = np.zeros(n_points, np.int64)
    sem[:n_floor] = 1            # floor
    sem[n_floor:n_floor + n_wall] = 0  # wall
    inst = np.full(n_points, -1, np.int64)

    per = n_things // n_instances
    start = n_floor + n_wall
    labels = []
    for i in range(n_instances):
        ctr = rng.uniform(0.5, extent - 0.5, 3) * np.array([1, 1, 0.3])
        size = rng.uniform(0.2, 0.8, 3)
        lo = start + i * per
        hi = start + (i + 1) * per if i < n_instances - 1 else n_points
        m = hi - lo
        # sample on the box SURFACE (real indoor scans are 2D manifolds;
        # keeps voxel downsample ratios realistic)
        face = rng.randint(0, 6, m)
        u = rng.uniform(-0.5, 0.5, (m, 3))
        axis = face // 2
        sign = (face % 2) * 1.0 - 0.5
        u[np.arange(m), axis] = sign
        pts[lo:hi, :3] = ctr + u * size
        cls = rng.randint(n_stuff, n_classes)
        sem[lo:hi] = cls
        inst[lo:hi] = i
        labels.append(cls - n_stuff)

    pts[:, 3:] = rng.randn(n_points, 3).astype(np.float32) * 0.5

    # superpoints: spatial grid cells, remapped to dense ids
    cell = extent / max(2, int(np.sqrt(n_superpoints)))
    key = (np.floor(pts[:, 0] / cell).astype(np.int64) * 1000
           + np.floor(pts[:, 1] / cell).astype(np.int64) * 10
           + np.floor(pts[:, 2] / 1.0).astype(np.int64))
    _, sp = np.unique(key, return_inverse=True)
    sp = sp % n_superpoints   # cap at the requested superpoint count

    num_sp = int(sp.max()) + 1
    from segdino3d_tpu.data.scannet_dataset import pool_to_superpoints
    onehot_i = np.zeros((n_points, n_instances), bool)
    has = inst >= 0
    onehot_i[np.arange(n_points)[has], inst[has]] = True
    sp_inst = pool_to_superpoints(onehot_i, sp, num_sp)
    onehot_s = np.zeros((n_points, n_classes + 1), bool)
    onehot_s[np.arange(n_points), np.clip(sem, 0, n_classes)] = True
    sp_sem = pool_to_superpoints(onehot_s, sp, num_sp)
    sp_sem[sp_sem.sum(-1) == 0, -1] = True

    inst_merged = inst.copy()
    inst_merged[inst_merged != -1] += n_stuff
    for k in range(n_stuff):
        inst_merged[sem == k] = k

    # synthetic DINO-X features: class-correlated so training can learn
    pf = np.zeros((n_points, feat_dim_2d), np.float32)
    pf[np.arange(n_points), sem % feat_dim_2d] = 1.0
    pf += rng.randn(n_points, feat_dim_2d).astype(np.float32) * 0.1
    q2p = np.zeros((n_queries2d, 3), np.float32)
    q2f = rng.randn(n_queries2d, feat_dim_2d).astype(np.float32) * 0.1
    for k in range(min(n_queries2d, n_instances)):
        m = inst == k
        q2p[k] = pts[m, :3].mean(0)
        q2f[k, labels[k] % feat_dim_2d] += 1.0
    for k in range(n_instances, n_queries2d):
        q2p[k] = rng.uniform(0, extent, 3)

    return dict(
        scene_id=f"synth{seed:04d}",
        scene_idx=seed,
        points=pts,
        superpoint_ids=sp.astype(np.int64),
        point_inst_ids=inst,
        inst_labels=np.asarray(labels, np.int64),
        sp_inst_masks=sp_inst.T,   # (I, S)
        sp_sem_masks=sp_sem.T,     # (C+1, S)
        points_2dfeats=pf,
        query2d_feats=q2f,
        query2d_pos=q2p,
        elastic_coords=None,
        semantic_masks=sem,
        inst_merged=inst_merged,
    )


def write_scannet_layout(root: str, seeds, n_classes: int = 18, **kw):
    """Write synthetic scenes in the reference's .bin/.pth disk layout so
    the real reader path (``ScanNet200InstanceSeg3D``) can be tested."""
    import torch

    os.makedirs(os.path.join(root, "meta_data"), exist_ok=True)
    for sub in ("points", "instance_mask", "semantic_mask", "super_points"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    feat_root = os.path.join(root, "features_2d")
    os.makedirs(feat_root, exist_ok=True)

    ids = []
    for seed in seeds:
        rec = synthetic_scene(seed, n_classes=n_classes, **kw)
        sid = rec["scene_id"]
        ids.append(sid)
        rec["points"].astype(np.float32).tofile(
            os.path.join(root, "points", f"{sid}.bin"))
        rec["point_inst_ids"].astype(np.int64).tofile(
            os.path.join(root, "instance_mask", f"{sid}.bin"))
        rec["semantic_masks"].astype(np.int64).tofile(
            os.path.join(root, "semantic_mask", f"{sid}.bin"))
        rec["superpoint_ids"].astype(np.int64).tofile(
            os.path.join(root, "super_points", f"{sid}.bin"))
        torch.save([torch.tensor(rec["points_2dfeats"])],
                   os.path.join(feat_root, f"{sid}.pth"))
        torch.save(torch.tensor(rec["query2d_feats"]),
                   os.path.join(feat_root, f"{sid}_query_feats.pth"))
        torch.save(torch.tensor(rec["query2d_pos"]),
                   os.path.join(feat_root, f"{sid}_query_3dctr.pth"))
    for split in ("train", "val", "test"):
        with open(os.path.join(root, "meta_data",
                               f"scannetv2_{split}.txt"), "w") as f:
            f.write("\n".join(ids))
    return ids
