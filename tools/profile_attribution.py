"""Per-fusion device-time attribution for a jitted inference/train step.

This is the measurement tool behind the round-3 conv-layout decisions
(STATUS.md): it traces a few steady-state steps with ``jax.profiler``,
parses the exported ``*.trace.json.gz``, aggregates device time per HLO
op, and groups it by the *source* python module (XLA's ``source`` /
``tf_op`` metadata), so "where do the milliseconds go" has a per-layer
answer instead of a whole-step number.

The reference has no counterpart (torch profiler ad-hoc usage at best);
micro-benchmarks through this box's dev tunnel are untrustworthy
(~2-4 ms dispatch overhead per call), so whole-step tracing is the only
reliable attribution — see STATUS.md "Pallas: evidence-based
disposition" for numbers produced this way.

Usage (real TPU):
    python tools/profile_attribution.py --mode infer --iters 3
    python tools/profile_attribution.py --mode train --trace-dir /tmp/p
Optional layout overrides mirror bench.py's env knobs (BENCH_BLOCK_EDGES,
BENCH_STEM_GATHER, BENCH_VOXELS...).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(mode: str):
    os.environ.setdefault("SEGDINO_COMPUTE_DTYPE", "bfloat16")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    from bench import _SynthDataset
    from segdino3d_tpu.data.collate import PadSpec, attach_host_plan, collate
    from segdino3d_tpu.models.architecture.postprocess import predict_instance
    from __graft_entry__ import _build

    n_points = int(os.environ.get("BENCH_POINTS", "131072"))
    s_cap = int(os.environ.get("BENCH_SP", "1536"))
    voxel_cap = int(os.environ.get("BENCH_VOXELS", "92160"))
    edges_env = os.environ.get("BENCH_BLOCK_EDGES", "4,4,4,4,4")
    block_edges = ([int(x) for x in edges_env.split(",")]
                   if edges_env and edges_env != "0" else None)
    stem_gather = os.environ.get("BENCH_STEM_GATHER", "1") != "0"
    ratios = tuple(float(x) for x in os.environ.get(
        "BENCH_LEVEL_RATIOS", "1.0,0.4,0.15,0.06,0.025").split(","))
    caps_env = os.environ.get("BENCH_LEVEL_CAPS", "")
    level_caps = ([int(x) for x in caps_env.split(",")]
                  if caps_env else None)

    model, criterion, test_cfg, variables, _ = _build(
        n_points=2048, s_cap=128, i_cap=16, k2d=32, batch=1,
        num_layers=6, d_model=256, n_sem=200, n_inst_cls=198, feat2d=256)
    spec = PadSpec(n_points, s_cap, 64, 128, 200)
    ds = _SynthDataset(int(os.environ.get("BENCH_SCENE_POINTS", "120000")),
                       s_cap)
    recs = [ds.get_record(0)]
    batch = collate(recs, spec)
    batch = attach_host_plan(batch, recs, spec, voxel_size=0.02,
                             voxel_cap=None if level_caps else voxel_cap,
                             level_cap_ratios=ratios,
                             level_caps=level_caps,
                             block_edges=block_edges,
                             stem_gather=stem_gather)
    import jax.numpy as jnp

    if mode == "infer":
        def step(variables, batch):
            outputs, _ = model.apply(variables, batch, False)
            r = predict_instance(
                outputs["cls_preds"][0], outputs["masks"][0],
                outputs["query_valid"][0], outputs["sp_valid"][0],
                batch.superpoint_ids[0], batch.point_valid[0],
                batch.points[0, :, :3], 0.0, test_cfg,
                centers=outputs["centers"][0], sizes=outputs["sizes"][0],
                filter_outofbox=True)
            return r.scores.sum()

        return jax.jit(step), (variables, batch)

    from segdino3d_tpu.parallel.train_step import (create_train_state,
                                                   make_train_step)
    from segdino3d_tpu.train.optim import build_optimizer
    import jax.random as jrandom

    model_t, criterion_t, _tc, _, _ = _build(
        n_points=n_points, s_cap=s_cap, i_cap=64, k2d=128, batch=1,
        num_layers=6, d_model=256, n_sem=200, n_inst_cls=198,
        feat2d=256, init=False)
    tx, _ = build_optimizer(dict(lr=1e-4, weight_decay=0.05),
                            dict(total_iters=1000, power=0.9),
                            clip_max_norm=10.0)
    state = create_train_state(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, tx, use_ema=True)
    train_step = make_train_step(model_t, criterion_t, tx, ema_decay=0.9997)

    def step(state, batch):
        new_state, m = train_step(state, batch, jrandom.PRNGKey(0))
        return m["total_loss"]

    return jax.jit(step), (state, batch)


MODULE_PAT = re.compile(r"segdino3d_tpu/([\w/]+)\.py")


def attribute(trace_dir: str, iters: int, top: int):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    ev = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            ev.extend(json.load(fh).get("traceEvents", []))
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    agg, meta = collections.Counter(), {}
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "")
            agg[name] += e.get("dur", 0) / 1e3
            total += e.get("dur", 0) / 1e3
            a = e.get("args") or {}
            if a and name not in meta:
                meta[name] = {k: a.get(k) for k in
                              ("tf_op", "source", "long_name", "hlo_op")
                              if a.get(k)}
    print(f"total device time: {total / iters:.1f} ms/iter "
          f"({len(agg)} distinct ops over {iters} iters)")

    by_module = collections.Counter()
    for name, ms in agg.items():
        src = (meta.get(name, {}).get("source") or
               meta.get(name, {}).get("tf_op") or "")
        m = MODULE_PAT.search(str(src))
        by_module[m.group(1) if m else "(unattributed)"] += ms
    print("\n--- per-module (ms/iter) ---")
    for mod, ms in by_module.most_common():
        print(f"{ms / iters:8.2f}  {mod}")

    print(f"\n--- top {top} fusions (ms/iter) ---")
    for name, ms in agg.most_common(top):
        info = json.dumps(meta.get(name, {}))[:220]
        print(f"{ms / iters:8.2f}  {name[:70]}  {info}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("infer", "train"), default="infer")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/segdino_prof")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip running; parse an existing trace dir")
    args = ap.parse_args()

    if not args.parse_only:
        import jax

        fn, fargs = build_step(args.mode)
        jax.device_get(fn(*fargs))   # compile
        jax.device_get(fn(*fargs))   # warm
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(args.iters):
            r = fn(*fargs)
        jax.device_get(r)
        jax.profiler.stop_trace()
    attribute(args.trace_dir, args.iters, args.top)


if __name__ == "__main__":
    main()
