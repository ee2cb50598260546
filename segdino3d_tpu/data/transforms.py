"""Host-side (numpy) point-cloud augmentation pipeline.

Parity targets (``/root/reference/segdino3d/datasets/transform/``):
* ``CustomRandomFlip3D`` — independent x/y axis flips, p=0.5 each, applied
  to points AND ``query2d_pos`` (point_cloud_transforms.py:96-157);
* ``CustomGlobalRotScaleTrans`` — z-rotation U[-pi,pi], scale U[0.8,1.2],
  translation N(0, 0.1) per axis; same transform applied to query2d_pos
  (:230-354);
* ``NormalizePointsColor`` — (rgb - mean) / std (:357-389);
* ``ElasticTransfrom`` — two-scale smoothed-noise displacement in voxel
  units, p=0.5, writing ``elastic_coords`` (and displacing query2d_pos with
  the same noise interpolators) (:392-473);
* factory ``Scannet200Transforms`` with the SPFormer color stats
  (wrappers_3d.py:7-56).

These run in the input pipeline (CPU workers), not on TPU, exactly like the
reference's dataloader workers.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np
import scipy.interpolate
import scipy.ndimage

from segdino3d_tpu.registry import TRANSFORMS


class Compose3D:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, points, target, rng: np.random.RandomState):
        for t in self.transforms:
            points, target = t(points, target, rng)
        return points, target


def _q2d(target):
    ef = target.get("extra_features", {})
    return ef.get("query2d_pos")


def _set_q2d(target, val):
    target["extra_features"]["query2d_pos"] = val


class RandomFlip3D:
    def __init__(self, p_horizontal=0.5, p_vertical=0.5):
        self.p_h = p_horizontal
        self.p_v = p_vertical

    def __call__(self, points, target, rng):
        q2d = _q2d(target)
        if rng.rand() < self.p_h:
            points[:, 0] = -points[:, 0]
            if q2d is not None:
                q2d[:, 0] = -q2d[:, 0]
        if rng.rand() < self.p_v:
            points[:, 1] = -points[:, 1]
            if q2d is not None:
                q2d[:, 1] = -q2d[:, 1]
        return points, target


class GlobalRotScaleTrans:
    def __init__(self, rot_range=(-3.14, 3.14), scale_range=(0.8, 1.2),
                 translation_std=(0.1, 0.1, 0.1)):
        self.rot_range = rot_range
        self.scale_range = scale_range
        self.translation_std = np.asarray(translation_std, np.float32)

    def __call__(self, points, target, rng):
        q2d = _q2d(target)
        # rotation about z
        ang = rng.uniform(*self.rot_range)
        c, s = math.cos(ang), math.sin(ang)
        rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)
        points[:, :3] = points[:, :3] @ rot
        if q2d is not None:
            q2d[:] = q2d @ rot
        target["pcd_rotation_angle"] = ang
        # scale (shared 'sync scale' hook: pre-set pcd_scale_factor wins,
        # mirroring the reference's sync-scale batch samplers)
        scale = target.get("pcd_scale_factor")
        if scale is None:
            scale = rng.uniform(*self.scale_range)
        target["pcd_scale_factor"] = scale
        points[:, :3] *= scale
        if q2d is not None:
            q2d *= scale
        # translation
        trans = rng.normal(scale=self.translation_std, size=3).astype(np.float32)
        points[:, :3] += trans
        if q2d is not None:
            q2d += trans
        return points, target


class NormalizePointsColor:
    def __init__(self, color_mean, color_std=127.5):
        self.mean = np.asarray(color_mean, np.float32)
        self.std = np.asarray(color_std, np.float32)

    def __call__(self, points, target, rng):
        points[:, 3:6] = (points[:, 3:6] - self.mean) / self.std
        return points, target


class ElasticTransform:
    """Two-scale smoothed-noise elastic displacement in voxel units."""

    def __init__(self, gran=(6, 20), mag=(40, 160), voxel_size=0.02, p=0.5):
        self.gran = gran
        self.mag = mag
        self.voxel_size = voxel_size
        self.p = p

    def _make_interp(self, x, gran, rng):
        blur_axes = [np.ones((3, 1, 1), np.float32) / 3,
                     np.ones((1, 3, 1), np.float32) / 3,
                     np.ones((1, 1, 3), np.float32) / 3]
        dims = np.abs(x).max(0).astype(np.int32) // gran + 3
        noise = [rng.randn(*dims).astype(np.float32) for _ in range(3)]
        for blur in blur_axes * 2:
            noise = [scipy.ndimage.convolve(n, blur, mode="constant", cval=0)
                     for n in noise]
        ax = [np.linspace(-(d - 1) * gran, (d - 1) * gran, d) for d in dims]
        return [scipy.interpolate.RegularGridInterpolator(
            ax, n, bounds_error=False, fill_value=0) for n in noise]

    def _apply(self, x, interp, mag):
        disp = np.stack([f(x) for f in interp], axis=1).astype(np.float32)
        return x + disp * mag

    def __call__(self, points, target, rng):
        coords = points[:, :3].astype(np.float32) / self.voxel_size
        q2d = _q2d(target)
        q2d_coords = None if q2d is None else q2d / self.voxel_size
        if rng.rand() < self.p:
            for gran, mag in zip(self.gran, self.mag):
                interp = self._make_interp(coords, gran, rng)
                coords = self._apply(coords, interp, mag)
                if q2d_coords is not None:
                    q2d_coords = self._apply(q2d_coords, interp, mag)
        target["elastic_coords"] = coords
        if q2d_coords is not None:
            target["extra_features"]["elastic_coords_query2d_pos"] = q2d_coords
        target["coords_voxel_size"] = self.voxel_size
        return points, target


# SPFormer / reference color statistics (wrappers_3d.py:19-26)
SCANNET_COLOR_MEAN = (0.47793125906962 * 255,
                      0.4303257521323044 * 255,
                      0.3749598901421883 * 255)
SCANNET_COLOR_STD = (0.2834475483823543 * 255,
                     0.27566157565723015 * 255,
                     0.27018971370874995 * 255)


@TRANSFORMS.register_module()
def Scannet200Transforms(scene_set: str, voxel_size: float = 0.02,
                         debug: bool = False, **_) -> Compose3D:
    if scene_set == "train":
        return Compose3D([
            RandomFlip3D(0.5, 0.5),
            GlobalRotScaleTrans((-3.14, 3.14), (0.8, 1.2), (0.1, 0.1, 0.1)),
            NormalizePointsColor(SCANNET_COLOR_MEAN, SCANNET_COLOR_STD),
            ElasticTransform((6, 20), (40, 160), voxel_size, p=0.5),
        ])
    if scene_set in ("val", "test"):
        return Compose3D([
            NormalizePointsColor(SCANNET_COLOR_MEAN, SCANNET_COLOR_STD),
        ])
    raise ValueError(scene_set)


# ScanNet v2 uses the same pipeline (reference wrappers share stats)
TRANSFORMS.register_module("ScannetTransforms", Scannet200Transforms)
