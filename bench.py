"""Benchmark: ScanNet200-val-style batched inference throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full flagship inference path — sparse U-Net backbone (Pallas/
XLA gather-GEMM convs), 6-layer query decoder with DINO-X cross-attention,
and on-device post-processing (top-600, matrix-NMS, superpoint unpooling,
thresholds) — on realistic ScanNet200-sized synthetic scenes (~120k points,
~1.4k superpoints at 2 cm voxels), batched B scenes per step.

``vs_baseline``: the reference publishes no throughput (BASELINE.md). We
compare against an estimated 2.5 scenes/sec for the reference's
single-scene CUDA eval loop on A100 (forward + GPU postproc, bs=1,
``evaluation/evaluate_3d.py``); the BASELINE.json target is >=5x that.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_REFERENCE_SCENES_PER_SEC = 2.5   # estimated; see module docstring


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segdino3d_tpu.builder import Capacities, build_model
    from segdino3d_tpu.data.collate import PadSpec, collate
    from segdino3d_tpu.data.synthetic import synthetic_scene
    from segdino3d_tpu.models.architecture.postprocess import predict_instance

    batch_size = int(os.environ.get("BENCH_BATCH", "1"))
    n_points = int(os.environ.get("BENCH_POINTS", "131072"))
    n_scene_points = int(os.environ.get("BENCH_SCENE_POINTS", "120000"))
    s_cap = int(os.environ.get("BENCH_SP", "1536"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    caps = Capacities(num_points=n_points, num_voxels=n_points,
                      num_superpoints=s_cap, num_instances=64,
                      num_queries2d=128)
    import __graft_entry__ as ge
    model_cfg = ge._build.__wrapped__ if hasattr(ge._build, "__wrapped__") else None

    # flagship config (ScanNet200): 259-ch input, 6 layers, 198/200 classes
    from __graft_entry__ import _build  # reuse builder
    model, _criterion, test_cfg, variables, _small = _build(
        n_points=2048, s_cap=128, i_cap=16, k2d=32, batch=1,
        num_layers=6, d_model=256, n_sem=200, n_inst_cls=198, feat2d=256)

    spec = PadSpec(n_points, s_cap, 64, 128, 200)
    recs = [synthetic_scene(i, n_points=n_scene_points, n_instances=24,
                            n_superpoints=s_cap, n_classes=180,
                            feat_dim_2d=256, extent=8.0)
            for i in range(batch_size)]
    batch = collate(recs, spec)

    def infer(variables, batch):
        outputs, _ = model.apply(variables, batch, False)

        def post(b):
            return predict_instance(
                outputs["cls_preds"][b], outputs["masks"][b],
                outputs["query_valid"][b], outputs["sp_valid"][b],
                batch.superpoint_ids[b], batch.point_valid[b],
                batch.points[b, :, :3], 0.0, test_cfg,
                centers=outputs["centers"][b], sizes=outputs["sizes"][b],
                filter_outofbox=True)

        preds = [post(b) for b in range(batch_size)]
        return ([p.scores for p in preds], [p.labels for p in preds],
                [p.valid for p in preds])

    fn = jax.jit(infer)

    t0 = time.time()
    out = jax.block_until_ready(fn(variables, batch))
    compile_time = time.time() - t0

    # warmup steady-state
    jax.block_until_ready(fn(variables, batch))
    t0 = time.time()
    for _ in range(iters):
        out = fn(variables, batch)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    scenes_per_sec = batch_size / dt

    n_chips = 1  # bench runs on the single available chip
    value = scenes_per_sec / n_chips
    print(json.dumps({
        "metric": "scannet200_val_inference_scenes_per_sec_per_chip",
        "value": round(value, 4),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(value / A100_REFERENCE_SCENES_PER_SEC, 4),
    }))
    print(f"# batch={batch_size} points={n_scene_points} sp={s_cap} "
          f"step={dt*1000:.1f}ms compile={compile_time:.1f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
