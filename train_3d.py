"""Training / evaluation entry point.

CLI-compatible with the reference's ``train_3d.py`` (same flags:
``--config_file --work_dir --options --seed --eval_only --resume
--load_pretrained_ckpt``; reference ``train_3d.py:42-97``), driving the
TPU-native stack: mesh data parallelism instead of DDP, one jitted train
step instead of the python loss/backward/step sequence.
"""
from __future__ import annotations

import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_args():
    p = argparse.ArgumentParser("SegDINO3D-TPU training")
    p.add_argument("--config_file", required=True)
    p.add_argument("--work_dir", default="work_dirs/default")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--eval_only", action="store_true")
    p.add_argument("--eval_first", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--load_pretrained_ckpt", default=None)
    p.add_argument("--kernel_order", default="x_slowest",
                   choices=["x_slowest", "x_fastest"],
                   help="ME kernel-offset enumeration assumed when "
                        "converting torch checkpoints (derivation: "
                        "train/torch_import.py:kernel_permutation; "
                        "parity_eval.sh tries both)")
    p.add_argument("--num_eval_scenes", type=int, default=None)
    p.add_argument("--eval_batch_size", type=int, default=None,
                   help="scenes per eval step (default: cfg "
                        "data.eval_batch_size or 1); scenes are padded to "
                        "bucketed capacities")
    p.add_argument("--profile_steps", default=None,
                   help="START:STOP — capture a jax.profiler trace of these "
                        "train steps into work_dir/profile")
    p.add_argument("--eval_cache_dir", default="auto",
                   help="persistent eval batch cache (data/eval_cache.py): "
                        "the static val set's host work (IO/collate/C++ "
                        "plan) builds once and later eval passes serve "
                        "mmap views only.  'auto' = <work_dir>/eval_cache; "
                        "'none' disables")
    p.add_argument("--compile_cache_dir", default="auto",
                   help="persistent XLA compile cache "
                        "(jax_compilation_cache_dir): second process "
                        "start pays seconds, not minutes, of compile. "
                        "'auto' = <work_dir>/../.jax_cache (shared across "
                        "runs); 'none' disables")
    p.add_argument("--accum_steps", type=int, default=None,
                   help="gradient-accumulation microbatches per step "
                        "(default: cfg accum_steps or 1) — runs the "
                        "reference's bs=4 single-GPU recipe on one 16G "
                        "chip; train_batch_size must be divisible by "
                        "n_devices * accum_steps")
    p.add_argument("--options", nargs="*", default=None,
                   help="key=value config overrides (nested keys with dots)")
    return p.parse_args()


def parse_options(opts):
    if not opts:
        return {}
    out = {}
    for kv in opts:
        k, v = kv.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def main():
    # the axon sitecustomize registers the TPU backend at interpreter
    # startup, so env vars alone don't switch platforms (tests/conftest.py)
    if os.environ.get("SEGDINO_FORCE_CPU"):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    args = get_args()

    import jax
    import numpy as np

    from segdino3d_tpu.builder import Capacities, build_model
    from segdino3d_tpu.config.config import Config
    from segdino3d_tpu.data.bucketing import BucketPolicy
    from segdino3d_tpu.data.collate import PadSpec
    from segdino3d_tpu.data.loader import ConcatDataset, EvalLoader, TrainLoader
    from segdino3d_tpu.data.scannet_constants import (
        SCANNET200_CLASS_NAMES, SCANNET200_RAW_IDS, SCANNET20_CLASS_NAMES,
        SCANNET20_RAW_IDS)
    from segdino3d_tpu.evaluation.evaluate import evaluate
    from segdino3d_tpu.evaluation.evaluator import InstanceSeg3DEvaluator
    from segdino3d_tpu.gtypes import SceneBatch
    from segdino3d_tpu.parallel.mesh import init_distributed, make_mesh
    from segdino3d_tpu.parallel.train_step import (
        TrainState, create_train_state, make_train_step)
    from segdino3d_tpu.registry import DATASETS
    from segdino3d_tpu.train.checkpoint import (merge_pretrained,
                                                restore_checkpoint,
                                                save_checkpoint)
    from segdino3d_tpu.train.engine import train_loop
    from segdino3d_tpu.train.optim import build_optimizer
    from segdino3d_tpu.utils.logging import (dump_code, get_git_sha,
                                             setup_logger)
    import segdino3d_tpu.data.scannet_dataset  # noqa: F401 (registry)
    import segdino3d_tpu.data.transforms  # noqa: F401

    # persistent XLA compile cache: the production CLI's first-compile is
    # minutes (BENCH_r04: 110 s infer / 307 s train); warm starts are
    # seconds.  The reference has no compile problem to solve (eager
    # torch, evaluate_3d.py:44) — this is pure TPU-native debt.
    if args.compile_cache_dir != "none":
        cc = (os.path.normpath(os.path.join(args.work_dir, "..",
                                            ".jax_cache"))
              if args.compile_cache_dir == "auto" else args.compile_cache_dir)
        jax.config.update("jax_compilation_cache_dir", cc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    init_distributed()
    os.makedirs(args.work_dir, exist_ok=True)
    logger = setup_logger(args.work_dir, process_index=jax.process_index())
    logger.info(f"git sha: {get_git_sha()}")
    logger.info(f"devices: {jax.devices()}")
    dump_code(args.work_dir)

    cfg = Config.fromfile(args.config_file)
    cfg.merge_from_options(parse_options(args.options))
    cfg.dump(os.path.join(args.work_dir, "config.py"))

    caps = Capacities.from_cfg(cfg.get("capacities"))
    model, criterion, test_cfg = build_model(cfg.model, caps)

    # ---- init params with a tiny synthetic batch ----
    from segdino3d_tpu.data.synthetic import synthetic_scene
    from segdino3d_tpu.data.collate import collate
    n_sem = cfg.model["decoder_cfg"]["num_semantic_classes"]
    bb_cfg = cfg.model["pointcloud_backbone_cfg"]
    raw_extra = 6 if bb_cfg.get("type") == "SpConvUNet" else 3
    feat2d = max(bb_cfg.get("in_channels", 259) - raw_extra, 1)
    spec_small = PadSpec(4096, 256, 32, 32, n_sem)
    init_rec = synthetic_scene(0, n_points=2048, n_superpoints=64,
                               n_classes=min(n_sem, 18), feat_dim_2d=feat2d)
    init_batch = collate([init_rec], spec_small)
    rngs = {"params": jax.random.PRNGKey(args.seed),
            "queries": jax.random.PRNGKey(args.seed + 1)}
    variables = model.init(rngs, init_batch, False)
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"model parameters: {n_params / 1e6:.2f}M")

    if args.load_pretrained_ckpt:
        from segdino3d_tpu.train.torch_import import import_checkpoint
        pre_params, pre_stats, unmapped = import_checkpoint(
            args.load_pretrained_ckpt, kernel_order=args.kernel_order)
        if unmapped:
            logger.info(f"[torch_import] {len(unmapped)} unmapped keys, "
                        f"e.g. {unmapped[:5]}")
        # merge BOTH collections: the reference's load_model restores BN
        # running stats through the state_dict (utils/ckpt_utils.py:85-113);
        # dropping batch_stats would run eval BatchNorm on fresh (0, 1)
        # statistics and collapse mAP for a converted checkpoint.
        variables = dict(variables)
        variables["params"] = merge_pretrained(variables["params"],
                                               pre_params)
        if pre_stats and "batch_stats" in variables:
            variables["batch_stats"] = merge_pretrained(
                variables["batch_stats"], pre_stats)

    tx, sched = build_optimizer(cfg.optimizer, cfg.scheduler,
                                cfg.get("clip_max_norm"))
    state = create_train_state(variables, tx,
                               use_ema=cfg.get("use_ema", False))
    if args.resume:
        restored = restore_checkpoint(args.work_dir, jax.device_get(state))
        if restored is not None:
            state = restored
            logger.info(f"resumed at step {int(state.step)}")

    # ---- data ----
    spec = PadSpec(caps.num_points, caps.num_superpoints, caps.num_instances,
                   caps.num_queries2d, n_sem)
    eval_ds = DATASETS.build(dict(cfg.data["eval_main"][0]))
    n_stuff = len(cfg.get("evaluator_cfg", {}).get("stuff_class_inds", [0, 1]))
    if n_sem == 200:
        valid_ids, names = SCANNET200_RAW_IDS, SCANNET200_CLASS_NAMES
    else:
        valid_ids, names = SCANNET20_RAW_IDS, SCANNET20_CLASS_NAMES
    evaluator = InstanceSeg3DEvaluator(
        valid_class_ids=valid_ids, class_names=names,
        stuff_class_inds=list(range(n_stuff)))
    voxel_size = cfg.model["pointcloud_backbone_cfg"].get("voxel_size", 0.02)
    bb_type = cfg.model["pointcloud_backbone_cfg"].get("type", "Res16UNet34C")
    is_spconv = bb_type == "SpConvUNet"
    eval_plan_cfg = dict(voxel_size=voxel_size,
                         block_edges=cfg.model["pointcloud_backbone_cfg"].get(
                             "block_edges"),
                         stem_gather=cfg.model["pointcloud_backbone_cfg"].get(
                             "stem_gather", False),
                         # spconv path quantizes (p - p.min)/voxel and has
                         # a k3 stem (see wrapper.exact_min_shift)
                         stem_kernel=3 if is_spconv else cfg.model[
                             "pointcloud_backbone_cfg"].get(
                             "config", {}).get("conv1_kernel_size", 5),
                         exact_min_shift=is_spconv)
    if caps.level_cap_ratios:
        eval_plan_cfg["level_cap_ratios"] = tuple(caps.level_cap_ratios)
    # multi-chip eval: shard scenes over the data axis, per-device batch
    # eval_bsz/n_dev (default 1 — the measured optimum; STATUS.md).  The
    # reference is locked to single-card eval (evaluate_3d.py:45).
    # Multi-HOST eval composes two mechanisms: each process runs its
    # round-robin batch shard on a LOCAL-device mesh (embarrassingly
    # parallel — no cross-host device_put), then results merge through a
    # shared-filesystem gather (evaluate(gather_dir=...)).
    n_proc = jax.process_count()
    eval_devs = jax.local_devices()
    n_dev_eval = len(eval_devs)
    eval_mesh = (make_mesh(n_dev_eval, devices=eval_devs)
                 if n_dev_eval > 1 else None)
    eval_bsz = args.eval_batch_size or cfg.data.get("eval_batch_size")
    if eval_bsz is None:
        eval_bsz = n_dev_eval if eval_mesh is not None else 1
    if eval_mesh is not None and eval_bsz % n_dev_eval != 0:
        eval_bsz = -(-eval_bsz // n_dev_eval) * n_dev_eval
        logger.info(f"eval_batch_size rounded up to {eval_bsz} "
                    f"(multiple of {n_dev_eval} devices)")
    eval_cache = (os.path.join(args.work_dir, "eval_cache")
                  if args.eval_cache_dir == "auto" else
                  (None if args.eval_cache_dir == "none"
                   else args.eval_cache_dir))
    eval_loader = EvalLoader(
        eval_ds, spec, limit=args.num_eval_scenes, batch_size=eval_bsz,
        bucket_policy=BucketPolicy.default(
            n_sem, caps.num_points, caps.num_superpoints,
            caps.num_instances, caps.num_queries2d),
        host_plan_cfg=eval_plan_cfg,
        mesh_shards=n_dev_eval if eval_mesh is not None else 1,
        cache_dir=eval_cache,
        process_index=jax.process_index(), process_count=n_proc)

    def run_eval(st):
        from segdino3d_tpu.train.ema import swap_in_ema
        vs = (swap_in_ema(st) if cfg.get("use_ema")
              else {"params": st.params, "batch_stats": st.batch_stats})
        res = evaluate(model, vs, eval_loader, evaluator, test_cfg,
                       filter_outofbox=cfg.model.get(
                           "filter_outofbox_points_eval", True),
                       bg_class_id=eval_ds.bg_class_id, logger=logger,
                       mesh=eval_mesh,
                       # per-step gather dir: stale shards from an earlier
                       # in-training eval round must never satisfy the wait
                       gather_dir=(os.path.join(
                           args.work_dir, "eval_gather",
                           f"step_{int(st.step):010d}")
                           if n_proc > 1 else None),
                       process_index=jax.process_index(),
                       process_count=n_proc)
        if res:
            logger.info(
                f"mAP: {res['all_ap']:.4f}  mAP50: {res['all_ap_50']:.4f}  "
                f"mAP25: {res['all_ap_25']:.4f}")
        return res

    if args.eval_only:
        run_eval(state)
        return

    train_sets = [DATASETS.build(dict(c)) for c in cfg.data["train_main"]]
    dataset = ConcatDataset(train_sets)
    bsz = cfg.data.get("train_batch_size", 4)
    n_dev = len(jax.devices())
    accum = args.accum_steps or cfg.get("accum_steps", 1)
    if bsz % accum != 0:
        raise SystemExit(f"train_batch_size={bsz} not divisible by "
                         f"accum_steps={accum}")
    n_par = bsz // accum   # scenes stepped in parallel across devices
    mesh = make_mesh(min(n_dev, n_par)) if n_dev > 1 and n_par > 1 else None
    n_shards = mesh.devices.size if mesh is not None else 1
    if n_par % n_shards != 0:
        raise SystemExit(
            f"train_batch_size/accum_steps={n_par} not divisible by "
            f"{n_shards} devices")
    voxel_size = cfg.model["pointcloud_backbone_cfg"].get("voxel_size", 0.02)
    # block-dense conv layout: opt-in via config (the TPU prototypes set
    # it; CPU runs prefer the gather path — XLA CPU 3D convs are slow).
    # Training defaults to block_edges_train when present: the gather
    # path's backward (scatter-adds) is ~2x the block-dense backward.
    bb_cfg = cfg.model["pointcloud_backbone_cfg"]
    is_spconv_t = bb_cfg.get("type", "Res16UNet34C") == "SpConvUNet"
    host_plan_cfg = dict(voxel_size=voxel_size, voxel_cap=caps.num_voxels,
                         block_edges=bb_cfg.get(
                             "block_edges_train", bb_cfg.get("block_edges")),
                         stem_kernel=3 if is_spconv_t else bb_cfg.get(
                             "config", {}).get("conv1_kernel_size", 5),
                         exact_min_shift=is_spconv_t)
    if caps.level_cap_ratios:
        host_plan_cfg["level_cap_ratios"] = tuple(caps.level_cap_ratios)
    train_loader = TrainLoader(
        dataset, cfg.data.get("train_batch_size", 4), spec, seed=args.seed,
        sync_scale=cfg.data.get("sync_scale", True),
        num_workers=cfg.data.get("num_workers", 4),
        worker_mode=cfg.data.get("worker_mode", "thread"),
        shm_transport=cfg.data.get("shm_transport", True),
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        mesh_shards=n_shards * accum,
        host_plan_cfg=host_plan_cfg)

    base_step = make_train_step(
        model, criterion, tx,
        ema_decay=cfg.get("ema_decay") if cfg.get("use_ema") else None,
        mesh=mesh, stacked_batch=mesh is not None or accum > 1,
        accum_steps=accum)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P("data"))

        def step_fn(state, batch, rng):
            batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sh), batch)
            return base_step(state, batch, rng)
    else:
        step_fn = base_step

    train_loop(
        step_fn=step_fn, state=state, train_loader=train_loader,
        num_iterations=cfg.get("num_iterations", 1000),
        schedule_fn=sched, logger=logger,
        print_freq=cfg.get("print_freq", 10),
        save_step=cfg.get("save_step", 1000),
        eval_step=cfg.get("eval_step"), eval_fn=run_eval,
        work_dir=args.work_dir, seed=args.seed,
        eval_first=args.eval_first,
        profile_steps=(tuple(int(x) for x in args.profile_steps.split(":"))
                       if args.profile_steps else None))


if __name__ == "__main__":
    main()
