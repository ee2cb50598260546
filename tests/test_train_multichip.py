"""Multi-chip (virtual 8-device CPU mesh) training-step tests + graft entry.

These compile the full train step — minutes on CPU — so they carry the
``slow`` marker (excluded from the default run; ``pytest -m slow`` runs
them). A lightweight shard_map smoke test stays in the fast suite
(tests/test_parallel_smoke.py).
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, (variables, batch) = ge.entry()
    out = jax.jit(fn)(variables, batch)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_train_step_reduces_loss_single_device():
    """A few steps on one tiny synthetic batch should reduce the loss."""
    import __graft_entry__ as ge
    from segdino3d_tpu.parallel.train_step import (create_train_state,
                                                   make_train_step)
    from segdino3d_tpu.train.optim import build_optimizer

    model, criterion, _tc, variables, batch = ge._build(
        n_points=1024, s_cap=64, i_cap=16, k2d=16, batch=2,
        num_layers=2, d_model=64, n_sem=20, n_inst_cls=18, feat2d=32)
    tx, _ = build_optimizer(dict(lr=3e-4, weight_decay=0.0),
                            dict(total_iters=1000, power=0.9),
                            clip_max_norm=10.0)
    state = create_train_state(variables, tx)
    step = make_train_step(model, criterion, tx, mesh=None, donate=False)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
