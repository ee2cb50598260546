"""SegDINO3D architecture: backbone -> query selection -> decoder.

TPU-native counterpart of ``Baseline3D``
(``/root/reference/segdino3d/models/architecture/baseline3d.py:144-556``).
The whole forward — including GT instance centers/sizes and random query
subsampling — is one jittable function over a padded ``SceneBatch``.

Key behaviors replicated (file:line into the reference):
* scene range + per-instance centers (``mode_3d_center='median'`` = bbox
  center) and sizes from elastic-or-raw coordinates (:266-306) — computed
  here via segment min/max over per-point instance ids instead of a python
  loop over instances;
* random query subsampling with ``query_thr`` during training (:250-264):
  n = (thr + (1-thr)*U) * n_superpoints, queries = random permutation
  prefix, GT ``query_masks`` gathered to the selection;
* eval treats every superpoint as a query (:227-228);
* decoder input wiring incl. DINO-X query features from ``extra_features``
  (:195-205).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from segdino3d_tpu.gtypes import BackboneOutput, SceneBatch
from segdino3d_tpu.ops import scatter
from segdino3d_tpu.registry import ARCHITECTURES


def compute_scene_range_and_boxes(batch: SceneBatch, voxel_size: float,
                                  mode_3d_center: str = "median"):
    """Scene [min,max] + GT instance centers/sizes (reference :266-306)."""
    b, p = batch.points.shape[:2]
    if batch.elastic_coords is not None:
        coords = batch.elastic_coords * voxel_size
    else:
        coords = batch.points[..., :3]

    big = jnp.asarray(1e9, coords.dtype)
    pv = batch.point_valid[..., None]
    mins = jnp.min(jnp.where(pv, coords, big), axis=1)
    maxs = jnp.max(jnp.where(pv, coords, -big), axis=1)
    scene_range = jnp.stack([mins, maxs], axis=1)          # (B, 2, 3)

    centers = sizes = None
    if batch.point_inst_ids is not None:
        i_cap = batch.inst_labels.shape[1]
        ids = batch.point_inst_ids
        valid = batch.point_valid & (ids >= 0)
        seg = (jnp.arange(b, dtype=jnp.int32)[:, None] * i_cap
               + jnp.clip(ids, 0, i_cap - 1)).reshape(-1)
        flat = coords.reshape(-1, 3)
        vflat = valid.reshape(-1)
        imin = scatter.segment_min(flat, seg, b * i_cap, vflat)
        imax = -scatter.segment_min(-flat, seg, b * i_cap, vflat)
        imin = imin.reshape(b, i_cap, 3)
        imax = imax.reshape(b, i_cap, 3)
        has_pts = scatter.segment_count(seg, b * i_cap, vflat).reshape(
            b, i_cap) > 0
        if mode_3d_center == "median":
            ctr = (imax + imin) / 2
        elif mode_3d_center == "mean":
            summ = scatter.segment_sum(flat, seg, b * i_cap, vflat).reshape(
                b, i_cap, 3)
            cnt = scatter.segment_count(seg, b * i_cap, vflat).reshape(
                b, i_cap)
            ctr = summ / jnp.maximum(cnt, 1.0)[..., None]
        else:
            raise ValueError(mode_3d_center)
        sz = imax - imin
        centers = jnp.where(has_pts[..., None], ctr, 0.0)
        sizes = jnp.where(has_pts[..., None], sz, 0.0)
    return scene_range, centers, sizes


def select_queries_random(rng, sp_valid: jnp.ndarray, query_thr: float):
    """Random-permutation prefix selection (reference :250-264).

    Returns (query_sp_idx (B, S), query_valid (B, S)) — queries are a random
    permutation of valid superpoints; the first n = (thr+(1-thr)u)*n_valid
    are valid.
    """
    b, s = sp_valid.shape
    r_perm, r_n = jax.random.split(rng)
    noise = jax.random.uniform(r_perm, (b, s))
    noise = jnp.where(sp_valid, noise, 2.0)                # invalid last
    order = jnp.argsort(noise, axis=-1).astype(jnp.int32)  # (B, S)
    n_valid = sp_valid.sum(-1)
    u = jax.random.uniform(r_n, (b,))
    frac = query_thr + (1 - query_thr) * u
    n_sel = jnp.floor(frac * n_valid).astype(jnp.int32)
    qvalid = jnp.arange(s, dtype=jnp.int32)[None, :] < n_sel[:, None]
    return order, qvalid


@ARCHITECTURES.register_module()
class SegDINO3D(nn.Module):
    """Full model. ``backbone``/``decoder`` are bound flax submodules."""
    backbone: nn.Module     # SparseBackboneWrapper
    decoder: nn.Module      # ScanNetQueryDecoder
    num_classes: int = 198
    query_thr: float = 0.5
    query_num: int = -1
    mode_3d_center: str = "median"
    voxel_size: float = 0.02
    add_positional_embedding: bool = True

    def _gather_sp(self, arr, idx):
        """Gather along the superpoint axis with (B, S) indices."""
        return jnp.take_along_axis(arr, idx[..., None], axis=1) \
            if arr.ndim == 3 else jnp.take_along_axis(arr, idx, axis=1)

    @nn.compact
    def __call__(self, batch: SceneBatch, train: bool = False
                 ) -> Dict[str, Any]:
        scene_range, inst_centers, inst_sizes = compute_scene_range_and_boxes(
            batch, self.voxel_size, self.mode_3d_center)

        bb: BackboneOutput = self.backbone(batch, train)
        b, s = bb.sp_valid.shape

        if self.query_num > 0:
            # top-k superpoints by max class probability (reference :231-249)
            scores = self.decoder.score_superpoints(bb.sp_feats)  # (B, S)
            scores = jnp.where(bb.sp_valid, scores, -1.0)
            k = min(self.query_num, s)
            top_scores, q_idx = jax.lax.top_k(scores, k)
            q_idx = q_idx.astype(jnp.int32)
            q_valid = top_scores > -0.5
        elif train and self.query_thr < 1:
            rng = self.make_rng("queries")
            q_idx, q_valid = select_queries_random(
                rng, bb.sp_valid, self.query_thr)
        else:
            q_idx = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
            q_valid = bb.sp_valid

        queries_feat = self._gather_sp(bb.sp_feats, q_idx)
        queries_pos = self._gather_sp(bb.sp_pos, q_idx) \
            if self.add_positional_embedding else None

        dinox_q = dinox_pos = dinox_valid = None
        if batch.query2d_feats is not None:
            dinox_q = batch.query2d_feats
            dinox_pos = batch.query2d_pos
            dinox_valid = batch.query2d_valid

        outputs = self.decoder(
            sp_feats=bb.sp_feats,
            sp_valid=bb.sp_valid,
            sp_pos=bb.sp_pos,
            sp_pos_wo_elastic=bb.sp_pos_wo_elastic,
            queries_feat=queries_feat,
            query_valid=q_valid,
            queries_pos=queries_pos,
            dinox_queries=dinox_q,
            dinox_query_pos=dinox_pos,
            dinox_valid=dinox_valid,
            scene_range=scene_range,
            deterministic=not train,
        )

        gt = None
        if batch.sp_inst_masks is not None:
            # gather GT mask columns to the selected queries
            qm = jnp.take_along_axis(
                batch.sp_inst_masks, q_idx[:, None, :], axis=2)  # (B, I, Q)
            sem_onehot = batch.sp_sem_masks                      # (B, C+1, S)
            sem_targets_sp = jnp.argmax(sem_onehot, axis=1)      # (B, S)
            # superpoints whose one-hot row is all-zero argmax to 0; the
            # dataset preparer guarantees a set bit (unlabeled fallback)
            q_sem = jnp.take_along_axis(sem_targets_sp, q_idx, axis=1)
            gt = dict(
                labels=batch.inst_labels,
                gt_valid=batch.inst_valid,
                sp_masks=batch.sp_inst_masks,
                query_masks=qm,
                centers=inst_centers,
                sizes=inst_sizes,
                query_valid=q_valid,
                sp_valid=bb.sp_valid,
                query_sem_targets=q_sem,
            )

        outputs["scene_range"] = scene_range
        outputs["sp_valid"] = bb.sp_valid
        # the decoder may prepend learned queries (num_instance_queries>0)
        # and then returns the extended validity mask itself
        outputs.setdefault("query_valid", q_valid)
        outputs["query_sp_idx"] = q_idx
        outputs["sp_pos_wo_elastic"] = bb.sp_pos_wo_elastic
        return outputs, gt
