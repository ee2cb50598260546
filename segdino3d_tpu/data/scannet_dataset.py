"""ScanNet200 / ScanNet v2 instance-segmentation datasets (host side).

Parity target: ``ScanNet200InstanceSeg3D`` / ``ScanNetInstanceSeg3D``
(``/root/reference/segdino3d/datasets/dataset/scannet200.py:17-436``,
``scannet.py:16-393``).  Reads the same on-disk layout
(``points/{id}.bin`` float32 Nx6, ``instance_mask|semantic_mask/{id}.bin``
int64, ``super_points/{id}.bin`` int64, 2D features ``{id}.pth`` /
``{id}_query_feats.pth`` / ``{id}_query_3dctr.pth``), applies the same label
adjustments and GT pooling, and emits numpy record dicts that the padded
collate turns into ``SceneBatch`` pytrees.

Behaviors replicated:
* chair/floor swap + raw-id -> 0..199 LUT (scannet200.py:155-168);
* stuff exclusion & instance re-indexing (:170-183);
* eval-time merging of stuff points into pseudo-instances (:185-193);
* 2D multi-scale point features mean-fused (:233-234), train-time random
  query dropout (:227-232);
* superpoint GT pooling: one-hot scatter-mean > 0.5, semantic fallback row
  (:240-253);
* ScanNet v2 differences: NYU40->20 inline mapping, no LUT-swap, skip
  scenes without instances (scannet.py:73-81,173-175).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from segdino3d_tpu.data import scannet_constants as C
from segdino3d_tpu.registry import DATASETS, TRANSFORMS


def pool_to_superpoints(onehot: np.ndarray, sp_ids: np.ndarray,
                        num_sp: int) -> np.ndarray:
    """scatter-mean of one-hot rows over superpoints, then > 0.5."""
    sums = np.zeros((num_sp, onehot.shape[1]), np.float32)
    np.add.at(sums, sp_ids, onehot.astype(np.float32))
    counts = np.bincount(sp_ids, minlength=num_sp).astype(np.float32)
    means = sums / np.maximum(counts, 1.0)[:, None]
    return means > 0.5


class _ScanNetBase:
    """Shared reader logic; subclasses fix the label space."""

    num_semantic_classes: int
    bg_class_id: int

    def __init__(self,
                 scene_set: str,
                 root_scenes: str,
                 use_super_points: bool = True,
                 adjust_class_ids: bool = True,
                 exclude_stuffs: bool = True,
                 root_points_2dfeats: Optional[str] = None,
                 dropout_rate_2dfeats: float = 0.0,
                 transform_cfg: Optional[Dict] = None,
                 mode_fuse_multi_scale_2d_feats: str = "mean",
                 stuff_categories: Sequence[str] = ("wall", "floor"),
                 dataset_type: str = "scannet",
                 loss_branch: str = "cdn",
                 skip_empty_scenes: bool = False,
                 voxel_size: float = 0.02,
                 feats_2d_dtype: str = "float32",
                 num_semantic_classes: Optional[int] = None):
        if num_semantic_classes is not None:
            # override the dataset-default label space (tiny test configs)
            self.num_semantic_classes = num_semantic_classes
            self.bg_class_id = num_semantic_classes
        assert scene_set in ("train", "val", "test")
        self.scene_set = scene_set
        self.root_scenes = root_scenes
        self.use_super_points = use_super_points
        self.adjust_class_ids = adjust_class_ids
        self.exclude_stuffs = exclude_stuffs
        # "float16" halves host-side memory traffic of the dominant array
        # (the N x 256 DINO-X point features); the backbone computes in
        # bf16/f32 regardless, so precision is unaffected in practice
        self.feats_2d_dtype = np.dtype(feats_2d_dtype)
        self.root_points_2dfeats = root_points_2dfeats
        self.dropout_rate_2dfeats = dropout_rate_2dfeats
        self.mode_fuse = mode_fuse_multi_scale_2d_feats
        self.n_stuff = len(stuff_categories)
        self.dataset_type = dataset_type
        self.loss_branch = loss_branch
        self.skip_empty_scenes = skip_empty_scenes
        self.scene_ids = self._load_scene_ids()
        self._lut = self._build_lut()
        if transform_cfg is not None:
            tcfg = dict(transform_cfg)
            # accept either the factory cfg directly or the reference's
            # nested Segment3DTransform wrapper
            inner = tcfg.get("transform_cfg", tcfg)
            inner = dict(inner)
            inner.setdefault("scene_set", scene_set)
            self.transforms = TRANSFORMS.build(inner)
        else:
            from segdino3d_tpu.data.transforms import Scannet200Transforms
            self.transforms = Scannet200Transforms(scene_set, voxel_size)

    # ---- subclass hooks ----
    def _build_lut(self) -> np.ndarray:
        raise NotImplementedError

    def _adjust(self, sem: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def _load_scene_ids(self) -> List[str]:
        path = os.path.join(self.root_scenes, "meta_data",
                            f"scannetv2_{self.scene_set}.txt")
        with open(path) as f:
            return [l.strip() for l in f if l.strip()]

    def __len__(self):
        return len(self.scene_ids)

    def cache_fingerprint(self) -> str:
        """Identity for the eval batch cache (``data/eval_cache.py``):
        scene id list + (size, mtime) of each scene's points file, plus
        every reader knob that shapes the emitted records — so edited
        data or a changed reader config rotates the cache namespace."""
        import hashlib
        stats = []
        for sid in self.scene_ids:
            p = os.path.join(self.root_scenes, "points", f"{sid}.bin")
            try:
                st = os.stat(p)
                stats.append((sid, st.st_size, st.st_mtime_ns))
            except OSError:
                stats.append((sid, -1, -1))
        knobs = (type(self).__name__, self.scene_set, self.use_super_points,
                 self.adjust_class_ids, self.exclude_stuffs,
                 str(self.feats_2d_dtype), self.root_points_2dfeats,
                 self.mode_fuse, self.n_stuff, self.dataset_type,
                 self.skip_empty_scenes, self.num_semantic_classes)
        return hashlib.sha1(repr((knobs, stats)).encode()).hexdigest()[:16]

    def _load_2d(self, scene_id: str, rng: np.random.RandomState):
        import torch  # cpu torch only for .pth deserialization
        root = self.root_points_2dfeats
        pf = torch.load(os.path.join(root, f"{scene_id}.pth"),
                        map_location="cpu", weights_only=False)
        qf = torch.load(os.path.join(root, f"{scene_id}_query_feats.pth"),
                        map_location="cpu", weights_only=False)
        qp = torch.load(os.path.join(root, f"{scene_id}_query_3dctr.pth"),
                        map_location="cpu", weights_only=False)
        if self.mode_fuse == "mean":
            pf = torch.stack(list(pf), 0).mean(0) if isinstance(pf, (list, tuple)) else pf
        else:
            raise NotImplementedError(self.mode_fuse)
        pf = pf.float().numpy().astype(self.feats_2d_dtype, copy=False)
        qf = qf.float().numpy()
        qp = qp.float().numpy() if hasattr(qp, "numpy") else np.asarray(qp, np.float32)
        if self.dropout_rate_2dfeats > 0 and self.scene_set == "train":
            n = qp.shape[0]
            keep = int(n * (1 - self.dropout_rate_2dfeats))
            sel = rng.choice(n, keep, replace=False)
            qp, qf = qp[sel], qf[sel]
        return pf, qf, qp

    def get_record(self, idx: int,
                   rng: Optional[np.random.RandomState] = None,
                   sync_scale: Optional[float] = None) -> Dict:
        """Load + label-adjust + pool + augment one scene -> numpy record."""
        rng = rng or np.random.RandomState()
        scene_id = self.scene_ids[idx]
        root = self.root_scenes
        points = np.fromfile(os.path.join(root, "points", f"{scene_id}.bin"),
                             dtype=np.float32).reshape(-1, 6).copy()
        inst = np.fromfile(os.path.join(root, "instance_mask", f"{scene_id}.bin"),
                           dtype=np.int64)
        sem = np.fromfile(os.path.join(root, "semantic_mask", f"{scene_id}.bin"),
                          dtype=np.int64)
        if self.adjust_class_ids:
            sem = self._adjust(sem)

        n_cls = self.num_semantic_classes
        if self.exclude_stuffs:
            # stuff + unlabeled points lose their instance; re-index 0..k-1
            inst = inst.copy()
            inst[sem < self.n_stuff] = -1
            inst[sem >= n_cls] = -1
            uniq = np.unique(inst)
            remap = np.full(inst.max() + 2, -1, np.int64)
            remap[uniq] = np.arange(len(uniq)) - (1 if uniq[0] == -1 else 0)
            inst = remap[inst]

        pf = qf = qp = None
        if self.root_points_2dfeats is not None:
            pf, qf, qp = self._load_2d(scene_id, rng)

        sp = None
        sp_inst_masks = sp_sem_masks = None
        if self.use_super_points:
            sp = np.fromfile(
                os.path.join(root, "super_points", f"{scene_id}.bin"),
                dtype=np.int64)
            num_sp = int(sp.max()) + 1
            n_inst = int(inst.max()) + 1
            onehot_i = np.zeros((len(inst), n_inst), bool)
            has = inst >= 0
            onehot_i[np.arange(len(inst))[has], inst[has]] = True
            sp_inst_masks = pool_to_superpoints(onehot_i, sp, num_sp)  # (S, I)
            onehot_s = np.zeros((len(sem), n_cls + 1), bool)
            onehot_s[np.arange(len(sem)), np.clip(sem, 0, n_cls)] = True
            sp_sem_masks = pool_to_superpoints(onehot_s, sp, num_sp)   # (S, C+1)
            empty = sp_sem_masks.sum(-1) == 0
            sp_sem_masks[empty, -1] = True

        # eval-time stuff merging for GT annotation (reference :185-193)
        inst_merged = None
        if self.scene_set != "train":
            inst_merged = inst.copy()
            inst_merged[inst_merged != -1] += self.n_stuff
            for k in range(self.n_stuff):
                inst_merged[sem == k] = k

        # per-instance labels (train label space: -n_stuff when excluded)
        n_inst = int(inst.max()) + 1
        labels = np.zeros(n_inst, np.int64)
        for i in range(n_inst):
            m = inst == i
            if m.any():
                cid = int(sem[m][0])
                labels[i] = cid - self.n_stuff if self.exclude_stuffs else cid

        target = {
            "extra_features": {
                "query2d_pos": qp,
            },
        }
        points, target = self.transforms(
            points, {**target, "pcd_scale_factor": sync_scale}
            if sync_scale is not None else target, rng)

        record = dict(
            scene_id=scene_id,
            scene_idx=idx,
            points=points,
            superpoint_ids=sp,
            point_inst_ids=inst,
            inst_labels=labels,
            sp_inst_masks=None if sp_inst_masks is None else sp_inst_masks.T,  # (I, S)
            sp_sem_masks=None if sp_sem_masks is None else sp_sem_masks.T,     # (C+1, S)
            points_2dfeats=pf,
            query2d_feats=qf,
            query2d_pos=target["extra_features"].get("query2d_pos"),
            elastic_coords=target.get("elastic_coords"),
            semantic_masks=sem,
            inst_merged=inst_merged,
        )
        return record

    # torch-style protocol for generic loaders
    def __getitem__(self, idx):
        return self.get_record(idx)


@DATASETS.register_module()
class ScanNet200InstanceSeg3D(_ScanNetBase):
    num_semantic_classes = 200
    bg_class_id = 200

    def _build_lut(self):
        return C.scannet200_seg_label_lut()

    def _adjust(self, sem):
        # chair/floor swap (known ScanNet200 preprocessing quirk,
        # reference :155-168) then raw-id -> 0..199 LUT
        s = sem.copy()
        s[sem == 2] = 3
        s[sem == 3] = 2
        s = np.clip(s, 0, len(self._lut) - 1)
        return self._lut[s]


@DATASETS.register_module()
class ScanNetInstanceSeg3D(_ScanNetBase):
    """ScanNet v2 (20 classes); reference ``scannet.py``."""
    num_semantic_classes = 20
    bg_class_id = 20

    def __init__(self, *args, **kw):
        kw.setdefault("skip_empty_scenes", True)
        super().__init__(*args, **kw)

    def _build_lut(self):
        return C.scannet20_seg_label_lut()

    def _adjust(self, sem):
        s = np.clip(sem, 0, len(self._lut) - 1)
        return self._lut[s]
