"""Gradient accumulation (``make_train_step(accum_steps=k)``).

The reference trains batch 4 on ONE GPU
(``/root/reference/scripts/train.sh:6,20``,
``configs/prototypes/SegDINO3D_ScanNet200.py:45,73``); a monolithic
batch-4 forward OOMs a 16G v5e chip, so the TPU step scans k microbatches
and averages gradients.  These tests pin the accumulation arithmetic:

* accumulated grads == monolithic big-batch grads exactly for a
  BatchNorm-free model (the criterion is a mean over scenes);
* with the real model, the scan matches a hand-rolled python loop over
  microbatches (same rng folding, chained batch_stats) — the documented
  deviation from a monolithic batch is train-mode BatchNorm statistics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdino3d_tpu.parallel.train_step import (create_train_state,
                                               make_train_step)


class _StubModel:
    """Minimal model with the train-step contract: apply(variables, batch,
    train, rngs=..., mutable=[...]) -> ((outputs, gt), mutated)."""

    def init(self, rngs, batch, train):
        del rngs, train
        d = batch["x"].shape[-1]
        return {"params": {"w": jnp.full((d, 1), 0.3, jnp.float32),
                           "b": jnp.zeros((1,), jnp.float32)},
                "batch_stats": {"count": jnp.zeros((), jnp.float32)}}

    def apply(self, variables, batch, train, rngs=None, mutable=()):
        p = variables["params"]
        out = jnp.tanh(batch["x"] @ p["w"] + p["b"])
        mut = {"batch_stats": {
            "count": variables["batch_stats"]["count"] + 1.0}}
        return (out, batch["y"]), mut


def _stub_criterion(outputs, gt):
    # mean over scenes -> microbatch-mean == monolithic-batch value
    return {"mse": jnp.mean((outputs - gt) ** 2),
            "l1": jnp.mean(jnp.abs(outputs - gt))}


def _tx():
    import optax

    return optax.chain(optax.clip_by_global_norm(10.0),
                       optax.adamw(1e-2, weight_decay=0.01))


def test_accum_equals_monolithic_batch_no_bn():
    """accum(k x b) averaged grads == batch(k*b) grads; optimizer/EMA state
    after one step identical."""
    rng = np.random.RandomState(0)
    k, b, d = 4, 2, 6
    x = rng.randn(k, b, d).astype(np.float32)
    y = rng.randn(k, b, 1).astype(np.float32)
    model = _StubModel()
    tx = _tx()

    flat = {"x": jnp.asarray(x.reshape(k * b, d)),
            "y": jnp.asarray(y.reshape(k * b, 1))}
    stacked = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    variables = model.init(None, flat, True)

    step_mono = make_train_step(model, _stub_criterion, tx, donate=False,
                                ema_decay=0.9)
    step_accum = make_train_step(model, _stub_criterion, tx, donate=False,
                                 ema_decay=0.9, accum_steps=k)
    s0 = create_train_state(variables, tx, use_ema=True)
    key = jax.random.PRNGKey(7)
    s_mono, m_mono = step_mono(s0, flat, key)
    s_acc, m_acc = step_accum(s0, stacked, key)

    for name in ("mse", "l1", "total_loss", "grad_norm"):
        np.testing.assert_allclose(np.asarray(m_acc[name]),
                                   np.asarray(m_mono[name]),
                                   rtol=1e-5, err_msg=name)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(np.asarray(a),
                                                 np.asarray(b_), rtol=1e-5),
        s_acc.params, s_mono.params)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(np.asarray(a),
                                                 np.asarray(b_), rtol=1e-5),
        s_acc.ema_params, s_mono.ema_params)
    # documented deviation: mutable collections update once per microbatch
    assert float(s_acc.batch_stats["count"]) == k
    assert float(s_mono.batch_stats["count"]) == 1


def test_accum_rejects_wrong_leading_axis():
    model = _StubModel()
    tx = _tx()
    x = jnp.zeros((3, 2, 4))
    batch = {"x": x, "y": jnp.zeros((3, 2, 1))}
    variables = model.init(None, {"x": x[0], "y": jnp.zeros((2, 1))}, True)
    state = create_train_state(variables, tx)
    step = make_train_step(model, _stub_criterion, tx, donate=False,
                           accum_steps=4)
    with pytest.raises(ValueError, match="accum_steps=4"):
        step(state, batch, jax.random.PRNGKey(0))


@pytest.mark.slow
def test_accum_real_model_matches_python_loop():
    """Full flagship model (tiny caps): the scanned accumulation must equal
    a hand-rolled loop over microbatches — same per-microbatch rng folding
    and sequentially chained batch_stats."""
    import __graft_entry__ as ge
    from segdino3d_tpu.data.collate import stack_batches

    model, criterion, _tc, variables, batch1 = ge._build(
        n_points=1024, s_cap=64, i_cap=16, k2d=16, batch=1,
        num_layers=2, d_model=64, n_sem=20, n_inst_cls=18, feat2d=32)
    _, _, _, _, batch2 = ge._build(
        n_points=1024, s_cap=64, i_cap=16, k2d=16, batch=1,
        num_layers=2, d_model=64, n_sem=20, n_inst_cls=18, feat2d=32,
        seed=11, init=True)
    stacked = stack_batches([batch1, batch2])
    tx = _tx()
    state = create_train_state(variables, tx, use_ema=False)
    key = jax.random.PRNGKey(3)

    step = make_train_step(model, criterion, tx, donate=False,
                           accum_steps=2)
    _, metrics = step(state, stacked, key)

    def loss_fn(params, bs, mb, r):
        (outputs, gt), mut = model.apply(
            {"params": params, "batch_stats": bs}, mb, True,
            rngs={"queries": r}, mutable=["batch_stats"])
        losses = criterion(outputs, gt)
        return sum(losses.values()), (losses, mut["batch_stats"])

    bs = state.batch_stats
    totals, grads = [], []
    for i, mb in enumerate([batch1, batch2]):
        r = jax.random.fold_in(key, i)
        (t, (_l, bs)), g = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(
            state.params, bs, mb, r)
        totals.append(t)
        grads.append(g)
    want_total = float((totals[0] + totals[1]) / 2)
    np.testing.assert_allclose(float(metrics["total_loss"]), want_total,
                               rtol=2e-4)
    import optax

    mean_g = jax.tree_util.tree_map(lambda a, b_: (a + b_) / 2, *grads)
    np.testing.assert_allclose(float(metrics["grad_norm"]),
                               float(optax.global_norm(mean_g)), rtol=2e-4)
