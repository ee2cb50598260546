"""Host-plan data parallelism: stacked per-shard plans over a virtual mesh.

Validates the production training path — host C++ plan building + shard_map
DDP — on 4 virtual CPU devices. Slow (full train-step compile).
"""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.slow


def test_stacked_hostplan_train_step():
    import __graft_entry__ as ge
    from segdino3d_tpu.data.collate import (PadSpec, attach_host_plan,
                                            collate, stack_batches)
    from segdino3d_tpu.data.synthetic import synthetic_scene
    from segdino3d_tpu.parallel.train_step import (create_train_state,
                                                   make_train_step)
    from segdino3d_tpu.train.optim import build_optimizer

    n_dev = 4
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devices), ("data",))

    model, criterion, _tc, variables, _ = ge._build(
        n_points=1024, s_cap=64, i_cap=16, k2d=16, batch=1,
        num_layers=2, d_model=64, n_sem=20, n_inst_cls=18, feat2d=32)

    spec = PadSpec(1024, 64, 16, 16, 20)
    shards = []
    for d in range(n_dev):
        rec = synthetic_scene(d, n_points=1000, n_superpoints=64,
                              n_classes=18, n_queries2d=12, feat_dim_2d=32)
        b = collate([rec], spec)
        b = attach_host_plan(b, [rec], spec, voxel_size=0.02,
                             voxel_cap=1024,
                             level_cap_ratios=(1, 1, 1, 1, 1))
        shards.append(b)
    stacked = stack_batches(shards)
    stacked = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), stacked)

    tx, _ = build_optimizer(dict(lr=1e-3, weight_decay=0.0),
                            dict(total_iters=100, power=0.9),
                            clip_max_norm=10.0)
    state = create_train_state(variables, tx)
    step = make_train_step(model, criterion, tx, mesh=mesh,
                           stacked_batch=True, donate=False)
    rng = jax.random.PRNGKey(0)
    l0 = None
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, stacked, sub)
        total = float(metrics["total_loss"])
        assert np.isfinite(total)
        l0 = total if l0 is None else l0
    assert total <= l0 * 1.5  # moving, not exploding
