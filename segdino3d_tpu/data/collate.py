"""Padded-batch assembly: numpy records -> ``SceneBatch`` pytrees.

Replaces the reference's identity-zip ``collate_fn_3D``
(``/root/reference/utils/dataset_utils.py:215-230``) — instead of ragged
python lists, scenes are padded to static capacities so the whole step jits.
Capacities are bucketed (rounded up to configurable multiples) to bound the
number of distinct compiled programs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from segdino3d_tpu.gtypes import SceneBatch


@dataclass(frozen=True)
class PadSpec:
    num_points: int
    num_superpoints: int
    num_instances: int
    num_queries2d: int
    num_semantic_classes: int

    @staticmethod
    def for_records(records: Sequence[Dict], num_semantic_classes: int,
                    pt_multiple: int = 8192, sp_multiple: int = 128,
                    inst_multiple: int = 16, q2d_multiple: int = 16
                    ) -> "PadSpec":
        def cap(n, m):
            return max(m, int(-(-n // m)) * m)
        p = max(r["points"].shape[0] for r in records)
        s = max((0 if r["superpoint_ids"] is None else
                 int(r["superpoint_ids"].max()) + 1) for r in records)
        i = max(len(r["inst_labels"]) for r in records)
        k = max((0 if r.get("query2d_pos") is None else r["query2d_pos"].shape[0])
                for r in records)
        return PadSpec(cap(p, pt_multiple), cap(s, sp_multiple),
                       cap(i, inst_multiple), cap(max(k, 1), q2d_multiple),
                       num_semantic_classes)


def _pad_to(arr: np.ndarray, n: int, axis: int = 0, fill=0):
    pad = n - arr.shape[axis]
    if pad < 0:
        raise ValueError(
            f"record dim {arr.shape[axis]} exceeds capacity {n} (axis {axis})")
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def collate(records: List[Dict], spec: PadSpec,
            device: bool = True) -> SceneBatch:
    b = len(records)
    P, S, I, K = (spec.num_points, spec.num_superpoints,
                  spec.num_instances, spec.num_queries2d)
    Csem = spec.num_semantic_classes

    points = np.zeros((b, P, 6), np.float32)
    point_valid = np.zeros((b, P), bool)
    sp_ids = np.zeros((b, P), np.int32)
    n_sp = np.zeros((b,), np.int32)
    inst_labels = np.zeros((b, I), np.int32)
    inst_valid = np.zeros((b, I), bool)
    point_inst = np.full((b, P), -1, np.int32)
    sp_inst_masks = np.zeros((b, I, S), bool)
    sp_sem_masks = np.zeros((b, Csem + 1, S), bool)
    scene_idx = np.zeros((b,), np.int32)

    any_2d = any(r.get("points_2dfeats") is not None for r in records)
    any_el = any(r.get("elastic_coords") is not None for r in records)
    c2d = next((r["points_2dfeats"].shape[-1] for r in records
                if r.get("points_2dfeats") is not None), 0)
    cq = next((r["query2d_feats"].shape[-1] for r in records
               if r.get("query2d_feats") is not None), 0)
    p2d_dtype = next((np.asarray(r["points_2dfeats"]).dtype for r in records
                      if r.get("points_2dfeats") is not None), np.float32)
    p2d = np.zeros((b, P, c2d), p2d_dtype) if any_2d else None
    q2f = np.zeros((b, K, cq), np.float32) if any_2d else None
    q2p = np.zeros((b, K, 3), np.float32) if any_2d else None
    q2v = np.zeros((b, K), bool) if any_2d else None
    elastic = np.zeros((b, P, 3), np.float32) if any_el else None

    for bi, r in enumerate(records):
        n = r["points"].shape[0]
        points[bi] = _pad_to(np.asarray(r["points"], np.float32), P)
        point_valid[bi, :n] = True
        if r["superpoint_ids"] is not None:
            sp_ids[bi] = _pad_to(r["superpoint_ids"].astype(np.int32), P)
            n_sp[bi] = int(r["superpoint_ids"].max()) + 1
        ni = len(r["inst_labels"])
        inst_labels[bi, :ni] = r["inst_labels"]
        inst_valid[bi, :ni] = True
        point_inst[bi] = _pad_to(r["point_inst_ids"].astype(np.int32), P, fill=-1)
        if r.get("sp_inst_masks") is not None:
            m = r["sp_inst_masks"]
            sp_inst_masks[bi, :m.shape[0], :m.shape[1]] = m
        if r.get("sp_sem_masks") is not None:
            m = r["sp_sem_masks"]
            # last row is the unlabeled/background class: keep it last even
            # when the record's label space is smaller than the spec's
            sp_sem_masks[bi, :m.shape[0] - 1, :m.shape[1]] = m[:-1]
            sp_sem_masks[bi, -1, :m.shape[1]] = m[-1]
        scene_idx[bi] = r.get("scene_idx", bi)
        if any_2d and r.get("points_2dfeats") is not None:
            p2d[bi] = _pad_to(np.asarray(r["points_2dfeats"], p2d_dtype), P)
            nq = r["query2d_feats"].shape[0]
            q2f[bi, :nq] = r["query2d_feats"]
            q2p[bi, :nq] = r["query2d_pos"]
            q2v[bi, :nq] = True
        if any_el:
            if r.get("elastic_coords") is not None:
                elastic[bi] = _pad_to(
                    np.asarray(r["elastic_coords"], np.float32), P)
            else:
                # fall back to raw coords / voxel units handled by caller;
                # mixed batches keep raw coords in voxel units
                vs = r.get("coords_voxel_size", 0.02)
                elastic[bi] = _pad_to(
                    np.asarray(r["points"][:, :3] / vs, np.float32), P)

    if device:
        import jax.numpy as jnp

        def j(x):
            return None if x is None else jnp.asarray(x)
    else:
        # numpy-leaf mode: process-pool loader workers must not touch a
        # jax backend; the arrays convert at dispatch in the parent
        def j(x):
            return x

    return SceneBatch(
        points=j(points), point_valid=j(point_valid),
        superpoint_ids=j(sp_ids), num_superpoints=j(n_sp),
        points_2dfeats=j(p2d), query2d_feats=j(q2f),
        query2d_pos=j(q2p), query2d_valid=j(q2v),
        elastic_coords=j(elastic),
        inst_labels=j(inst_labels), inst_valid=j(inst_valid),
        point_inst_ids=j(point_inst),
        sp_inst_masks=j(sp_inst_masks), sp_sem_masks=j(sp_sem_masks),
        scene_idx=j(scene_idx),
    )


def _plan_coords(batch: SceneBatch, records: List[Dict], voxel_size: float,
                 exact_min_shift: bool = False):
    """Voxel-unit plan coordinates for a collated batch — elastic coords
    when present, else xyz/voxel_size, min-shifted per scene (the backbone
    wrapper's exact coordinate policy: exact min for the spconv path,
    multiple-of-16 otherwise — see ``wrapper.exact_min_shift``)."""
    b, p = batch.points.shape[:2]
    coords = np.zeros((b, p, 3), np.float32)
    valid = np.asarray(batch.point_valid)
    for bi, r in enumerate(records):
        n = r["points"].shape[0]
        if r.get("elastic_coords") is not None:
            c = np.asarray(r["elastic_coords"], np.float32)
            mins = c.min(0)
            if not exact_min_shift:
                mins = np.floor(mins / 16.0) * 16.0
            coords[bi, :n] = c - mins
        elif exact_min_shift:
            # subtract in metric space BEFORE dividing — bit-identical to
            # the reference's (p - p.min(0)) / voxel (spconvunet.py:286)
            xyz = np.asarray(r["points"][:, :3], np.float32)
            coords[bi, :n] = (xyz - xyz.min(0)) / voxel_size
        else:
            c = np.asarray(r["points"][:, :3], np.float32) / voxel_size
            mins = np.floor(c.min(0) / 16.0) * 16.0
            coords[bi, :n] = c - mins
    bidx = np.repeat(np.arange(b, dtype=np.int32), p)
    return coords, valid, bidx


def probe_plan_caps(batch: SceneBatch, records: List[Dict], *,
                    voxel_size: float,
                    level_cap_ratios=(1.0, 0.7, 0.35, 0.12, 0.05),
                    num_levels: int = 5,
                    block_edges: Optional[Sequence[int]] = None,
                    headroom: float = 1.04,
                    exact_min_shift: bool = False):
    """Probe the bucketed capacities the auto path would pick for this
    batch (+``headroom`` slack) without attaching a plan.

    Returns ``(voxel_cap, block_caps)`` suitable for pinning ONE compiled
    plan shape across many batches — steady-state benches and fixed-shape
    serving want this, because per-batch auto-bucketing recompiles whenever
    a batch drifts to a neighboring bucket rung."""
    from segdino3d_tpu.ops.host_plan import (block_bucket, build_host_plan,
                                             probe_voxel_count, voxel_bucket)

    coords, valid, bidx = _plan_coords(batch, records, voxel_size,
                                   exact_min_shift)
    n_vox = probe_voxel_count(coords.reshape(-1, 3), bidx, valid.reshape(-1))
    voxel_cap = voxel_bucket(int(n_vox * headroom))
    caps = [max(256, -(-int(voxel_cap * r) // 256) * 256)
            for r in level_cap_ratios[:num_levels]]
    caps[0] = voxel_cap
    block_caps = None
    if block_edges is not None and any(block_edges):
        plan = build_host_plan(coords.reshape(-1, 3), bidx,
                               valid.reshape(-1), caps,
                               num_levels=num_levels,
                               block_edges=block_edges)
        block_caps = [0 if not lv.block_edge
                      else block_bucket(int(lv.num_blocks * headroom))
                      for lv in plan.levels]
    return voxel_cap, block_caps


def attach_host_plan(batch: SceneBatch, records: List[Dict], spec: PadSpec,
                     *, voxel_size: float, voxel_cap: Optional[int] = None,
                     level_cap_ratios=(1.0, 0.7, 0.35, 0.12, 0.05),
                     level_caps: Optional[Sequence[int]] = None,
                     num_levels: int = 5, stem_kernel: int = 5,
                     block_edges: Optional[Sequence[int]] = None,
                     block_caps: Optional[Sequence[int]] = None,
                     stem_gather: bool = False,
                     stem_compact: 'Optional[bool]' = None,
                     stem_compact_slots: 'Optional[int]' = None,
                     stem_ov_cap: 'Optional[int]' = None,
                     exact_min_shift: bool = False,
                     auto_l0_layout: bool = True,
                     device: bool = True) -> SceneBatch:
    """Build the sparse-conv plan on the host (C++) and attach it.

    Replicates the backbone wrapper's coordinate policy exactly: elastic
    coords (already voxel units) when present, else xyz/voxel_size, then a
    per-scene min-shift rounded down to a multiple of 16.

    ``voxel_cap=None`` probes the batch's unique-voxel count and picks a
    geometric bucket (~1.3x ladder) — bounded padding waste with a bounded
    number of compiled shapes.  ``level_caps`` (measured per-level voxel
    caps, e.g. from the EvalLoader prescan) overrides the
    ``level_cap_ratios`` derivation so levels 1+ pay no ratio padding.
    ``block_edges[l]`` > 0 switches level ``l`` to the block-dense conv
    layout (``ops.block_dense``); block counts are bucketed geometrically
    unless ``block_caps`` pins them.

    ``auto_l0_layout``: plan-time layout crossover — level 0 falls back to
    the gather-GEMM layout whenever its measured block count would push
    the widest level-0 dense conv onto the chunked (``lax.map``) path
    (``host_plan.l0_dense_fits``; replaces round-3's hand-picked
    ``dense_l0_max_voxels=160k`` knob with the mechanism that actually
    caused the measured 400k-pt crossover).
    """
    from segdino3d_tpu.ops.host_plan import (build_host_plan,
                                             host_plan_to_device,
                                             l0_dense_budget_bytes,
                                             probe_voxel_count, voxel_bucket)

    coords, valid, bidx = _plan_coords(batch, records, voxel_size,
                                   exact_min_shift)
    if level_caps is not None:
        # measured per-level caps (e.g. the EvalLoader prescan or the
        # bench probe): no ratio padding on levels 1+ — down/up convs,
        # layout transposes and norms all pay cap-many rows
        caps = [max(256, -(-int(c) // 256) * 256)
                for c in level_caps[:num_levels]]
        if voxel_cap is not None:
            caps[0] = voxel_cap
        voxel_cap = caps[0]
    else:
        if voxel_cap is None:
            n_vox = probe_voxel_count(coords.reshape(-1, 3), bidx,
                                      valid.reshape(-1))
            voxel_cap = voxel_bucket(n_vox)
        caps = [max(256, -(-int(voxel_cap * r) // 256) * 256)
                for r in level_cap_ratios[:num_levels]]
        caps[0] = voxel_cap
    plan = build_host_plan(coords.reshape(-1, 3), bidx, valid.reshape(-1),
                           caps, num_levels=num_levels,
                           stem_kernel=stem_kernel,
                           block_edges=block_edges, block_caps=block_caps,
                           stem_gather=stem_gather,
                           stem_compact=stem_compact,
                           stem_compact_slots=stem_compact_slots,
                           stem_ov_cap=stem_ov_cap,
                           l0_budget_bytes=(l0_dense_budget_bytes()
                                            if auto_l0_layout else None))
    if plan.overflow:
        raise ValueError("host plan capacity overflow — raise voxel caps")
    uplan, inverse = host_plan_to_device(plan, device=device)
    return batch.replace(unet_plan=uplan, plan_inverse_mapping=inverse)


def stack_batches(batches: List[SceneBatch]) -> SceneBatch:
    """Stack per-device SceneBatches (incl. host plans) on a new leading
    axis for ``shard_map`` data parallelism: each shard receives leading
    dim 1 and squeezes it (``make_train_step(stacked_batch=True)``).

    Auto-bucketed plan tables (block-dense neighbor tables) may differ in
    size across shards; they are padded to the per-leaf max first.  Every
    integer index array in this codebase uses -1 for "absent", so -1 fill
    keeps padded entries semantically empty (extra block slots are
    unoccupied and gather as zeros)."""
    import jax

    def stack(*xs):
        arrs = [np.asarray(x) for x in xs]
        shapes = {a.shape for a in arrs}
        if len(shapes) > 1:
            tgt = tuple(max(s[d] for s in shapes)
                        for d in range(len(arrs[0].shape)))
            fill = -1 if np.issubdtype(arrs[0].dtype, np.integer) else 0
            arrs = [np.pad(a, [(0, t - s) for s, t in zip(a.shape, tgt)],
                           constant_values=fill) for a in arrs]
        return np.stack(arrs)

    return jax.tree_util.tree_map(stack, *batches)


def eval_annotation(record: Dict, bg_class_id: int = 200) -> Dict[str, np.ndarray]:
    """Per-point GT maps for the evaluator (reference builds these from
    target masks in ``evaluate_3d.py:48-56``)."""
    inst = record["inst_merged"]
    sem = record["semantic_masks"]
    sem_ann = np.where(inst >= 0, sem, bg_class_id)
    return dict(pts_instance_mask=inst.astype(np.int64),
                pts_semantic_mask=sem_ann.astype(np.int64),
                lidar_idx=record["scene_id"])
