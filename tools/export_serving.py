"""AOT serving export: compile-free deployment artifact for inference.

Packages the flagship inference step (backbone + decoder + per-scene
``predict_instance`` postproc, mask outputs bit-packed for transfer) as
a serialized StableHLO function via ``jax.export``, alongside the
parameters and the host-side shape contract. A serving process loads
the artifact with ``load_artifact`` and runs it WITHOUT the model
code or a compile step at startup — the host keeps only the loader path
(collate + C++ sparse plan), exactly what a production replica needs.

The reference has no deployment story at all (eval re-instantiates the
torch model and compiles nothing ahead of time; ``train_3d.py
--eval_only`` + ``evaluation/evaluate_3d.py:45``). On TPU this matters:
first-compile of the full model is tens of seconds per process, and
``jax.export`` (StableHLO) artifacts are loadable cross-version.

Usage:
    python tools/export_serving.py --out /tmp/segdino3d_artifact \
        [--platform tpu|cpu] [--points 131072] [--sp 1536] [--run]

Artifact layout:
    model.shlo    serialized jax.export blob: f(params_leaves, batch_leaves)
    params.npz    parameter/batch-stat leaves, keyed by flattened path
    meta.json     PadSpec + plan knobs + per-leaf shapes/dtypes AND the
                  flattened key-paths of every batch leaf
                  (``batch_leaf_paths``) — the input contract.  Leaf ORDER
                  is ``jax.tree.flatten`` order of a ``collate`` +
                  ``attach_host_plan`` batch; a serving host either
                  imports the collate code (the intended path: the host
                  must run the C++ sparse-plan builder anyway) or lines
                  its arrays up against ``batch_leaf_paths``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_infer_fn(model, test_cfg, batch_size):
    """(variables, batch) -> per-scene packed instance predictions."""
    import jax
    import jax.numpy as jnp

    from segdino3d_tpu.models.architecture.postprocess import predict_instance
    from segdino3d_tpu.ops.bitpack import pack_bits

    def infer(variables, batch):
        outputs, _ = model.apply(variables, batch, False)

        def post(b):
            r = predict_instance(
                outputs["cls_preds"][b], outputs["masks"][b],
                outputs["query_valid"][b], outputs["sp_valid"][b],
                batch.superpoint_ids[b], batch.point_valid[b],
                batch.points[b, :, :3], 0.0, test_cfg,
                centers=outputs["centers"][b], sizes=outputs["sizes"][b],
                filter_outofbox=True)
            return dict(scores=r.scores, labels=r.labels, valid=r.valid,
                        masks_packed=pack_bits(r.point_masks))

        stacked = [post(b) for b in range(batch_size)]
        return {k: jnp.stack([s[k] for s in stacked]) for k in stacked[0]}

    return infer


def _load_ckpt_variables(ckpt: str, variables, kernel_order: str):
    """Restore trained weights: an orbax ``work_dir`` (train-loop layout;
    prefers EMA params when present, matching eval's ``swap_in_ema``) or a
    torch ``.pth`` bridged through ``train/torch_import``."""
    import jax

    if ckpt.endswith((".pth", ".pt", ".pkl")):
        from segdino3d_tpu.train.checkpoint import merge_pretrained
        from segdino3d_tpu.train.torch_import import import_checkpoint

        pre_params, pre_stats, unmapped = import_checkpoint(
            ckpt, kernel_order=kernel_order)
        if unmapped:
            print(f"[export] {len(unmapped)} unmapped torch keys, "
                  f"e.g. {unmapped[:3]}")
        variables = dict(variables)
        variables["params"] = merge_pretrained(variables["params"],
                                               pre_params)
        if pre_stats and "batch_stats" in variables:
            variables["batch_stats"] = merge_pretrained(
                variables["batch_stats"], pre_stats)
        return variables

    # raw (template-free) orbax restore: the export has no optimizer, so
    # it can't rebuild the full TrainState structure StandardRestore wants
    import orbax.checkpoint as ocp

    from segdino3d_tpu.train.checkpoint import _ckpt_dir

    with ocp.CheckpointManager(_ckpt_dir(ckpt)) as mgr:
        step = mgr.latest_step()
        if step is None:
            raise SystemExit(f"no checkpoint found under {ckpt}")
        raw = mgr.restore(step)
    params = raw["ema_params"] if raw.get("ema_params") is not None \
        else raw["params"]
    print(f"[export] restored step {step} from {ckpt} "
          f"({'EMA' if raw.get('ema_params') is not None else 'raw'} params)")
    return {"params": params, "batch_stats": raw.get("batch_stats", {})}


def export_artifact(out_dir: str, platform: str, n_points: int, s_cap: int,
                    batch_size: int = 1, n_scene_points: int = 120000,
                    tiny: bool = False, ckpt: str = None,
                    kernel_order: str = "x_slowest"):
    """``ckpt``: load trained weights into the exported artifact — either
    an orbax ``work_dir`` written by the train loop (restores params +
    batch_stats; EMA params when the checkpoint carries them) or a torch
    ``.pth`` bridged through ``train/torch_import``.  Without it the
    artifact packages randomly initialized parameters (smoke tests)."""
    import jax
    from jax import export as jexport

    from bench import _SynthDataset
    from segdino3d_tpu.data.collate import PadSpec, attach_host_plan, collate
    from __graft_entry__ import _build

    os.environ.setdefault("SEGDINO_COMPUTE_DTYPE", "bfloat16")
    # init on tiny shapes (params are capacity-independent), then
    # RE-instantiate the model with Capacities matching the serving spec:
    # the backbone wrapper bakes s_cap/n_points at build time
    # (superpoint ids clip to s_cap-1), so a model built smaller than the
    # served batch would silently alias superpoints >= s_cap into the
    # last slot and corrupt every instance mask.
    if tiny:
        _m, _c, _tc, variables, _ = _build(
            n_points=1024, s_cap=64, i_cap=8, k2d=16, batch=1,
            num_layers=2, d_model=64, n_sem=20, n_inst_cls=18, feat2d=32)
        model, _c, test_cfg, _, _ = _build(
            n_points=n_points, s_cap=s_cap, i_cap=8, k2d=16,
            batch=batch_size, num_layers=2, d_model=64, n_sem=20,
            n_inst_cls=18, feat2d=32, init=False)
    else:
        _m, _c, _tc, variables, _ = _build(
            n_points=2048, s_cap=128, i_cap=16, k2d=32, batch=1,
            num_layers=6, d_model=256, n_sem=200, n_inst_cls=198,
            feat2d=256)
        model, _c, test_cfg, _, _ = _build(
            n_points=n_points, s_cap=s_cap, i_cap=64, k2d=128,
            batch=batch_size, num_layers=6, d_model=256, n_sem=200,
            n_inst_cls=198, feat2d=256, init=False)

    if ckpt:
        variables = _load_ckpt_variables(ckpt, variables, kernel_order)

    k2d = 16 if tiny else 128
    i_cap = 8 if tiny else 64
    n_sem = 20 if tiny else 200
    spec = PadSpec(n_points, s_cap, i_cap, k2d, n_sem)
    # shape-consistency gate: the served spec must equal what the model
    # was built with (round-3 advisor finding: the old code built
    # s_cap=128 and served s_cap=1536 — every superpoint >= 128 aliased
    # into slot 127 and the artifact produced silently wrong masks)
    assert model.backbone.s_cap == spec.num_superpoints, \
        (model.backbone.s_cap, spec)
    if tiny:
        from segdino3d_tpu.data.synthetic import synthetic_scene
        recs = [synthetic_scene(i, n_points=n_scene_points, n_instances=6,
                                n_superpoints=s_cap, n_classes=18,
                                n_queries2d=8, feat_dim_2d=32)
                for i in range(batch_size)]
    else:
        ds = _SynthDataset(n_scene_points, s_cap)
        recs = [ds.get_record(i) for i in range(batch_size)]
    batch = collate(recs, spec)
    plan_kw = dict(voxel_size=0.02,
                   voxel_cap=int(os.environ.get("BENCH_VOXELS", "92160")),
                   level_cap_ratios=(1.0, 0.4, 0.15, 0.06, 0.025),
                   block_edges=[4, 4, 4, 4, 4], stem_gather=True)
    if tiny:
        plan_kw.update(voxel_cap=4096,
                       level_cap_ratios=(1.0, 0.6, 0.4, 0.3, 0.2))
    batch = attach_host_plan(batch, recs, spec, **plan_kw)

    infer = build_infer_fn(model, test_cfg, batch_size)

    var_leaves, var_tree = jax.tree.flatten(variables)
    batch_leaves, batch_tree = jax.tree.flatten(batch)

    def flat_infer(var_leaves, batch_leaves):
        return infer(jax.tree.unflatten(var_tree, var_leaves),
                     jax.tree.unflatten(batch_tree, batch_leaves))

    shapeof = lambda ls: [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in ls]
    exp = jexport.export(jax.jit(flat_infer), platforms=[platform])(
        shapeof(var_leaves), shapeof(batch_leaves))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "model.shlo"), "wb") as f:
        f.write(exp.serialize())
    np.savez(os.path.join(out_dir, "params.npz"),
             **{f"leaf_{i}": np.asarray(x)
                for i, x in enumerate(var_leaves)})
    leaf_paths = [jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(batch)[0]]
    meta = dict(
        platform=platform, batch_size=batch_size,
        n_batch_leaves=len(batch_leaves),
        batch_leaf_shapes=[list(x.shape) for x in batch_leaves],
        batch_leaf_dtypes=[str(np.dtype(x.dtype)) for x in batch_leaves],
        batch_leaf_paths=leaf_paths,
        ckpt=ckpt,
        pad_spec=dict(n_points=n_points, s_cap=s_cap, i_cap=i_cap,
                      k2d=k2d, n_sem=n_sem),
        plan=dict((k, list(v) if isinstance(v, (tuple, list)) else v)
                  for k, v in plan_kw.items()),
        n_scene_points=n_scene_points, tiny=tiny)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return exp, var_leaves, batch_leaves, meta, flat_infer


def load_artifact(out_dir: str):
    """Returns (call, meta): ``call(batch_leaves) -> outputs`` with the
    exported params bound — no model code, no compile at trace time."""
    from jax import export as jexport

    with open(os.path.join(out_dir, "model.shlo"), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    z = np.load(os.path.join(out_dir, "params.npz"))
    var_leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]

    def call(batch_leaves):
        return exp.call(var_leaves, batch_leaves)

    return call, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default=None,
                    help="tpu|cpu; default = current backend")
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--sp", type=int, default=1536)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--scene-points", type=int, default=120000)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model/shapes (CI / smoke)")
    ap.add_argument("--run", action="store_true",
                    help="reload the artifact and execute it once")
    ap.add_argument("--ckpt", default=None,
                    help="trained weights: an orbax work_dir from the "
                         "train loop, or a torch .pth to bridge; default "
                         "= random init (smoke only)")
    ap.add_argument("--kernel_order", default="x_slowest",
                    choices=["x_slowest", "x_fastest"])
    args = ap.parse_args()

    import jax
    platform = args.platform or jax.default_backend()
    exp, _vl, batch_leaves, meta, _fn = export_artifact(
        args.out, platform, args.points, args.sp, args.batch,
        args.scene_points, tiny=args.tiny, ckpt=args.ckpt,
        kernel_order=args.kernel_order)
    size = os.path.getsize(os.path.join(args.out, "model.shlo"))
    print(f"exported platform={platform} shlo={size / 1e6:.1f}MB "
          f"params={os.path.getsize(os.path.join(args.out, 'params.npz')) / 1e6:.1f}MB")
    if args.run:
        call, meta = load_artifact(args.out)
        out = call(batch_leaves)
        v = np.asarray(out["valid"])
        print(f"ran: {int(v.sum())} valid instances / "
              f"{v.size} slots; score[0]={float(np.asarray(out['scores'])[0, 0]):.4f}")


if __name__ == "__main__":
    main()
