"""Frozen-numerics regression for TRAINING: first-iteration gradients.

Round-4 VERDICT #7: inference numerics have a drift guard
(``test_backbone_frozen_numerics.py``); this gives the accumulated train
step the same protection.  A deterministic tiny flagship model + two
deterministic synthetic microbatches run one ``accum_steps=2`` train
step; the fixture freezes

* the step's scalar metrics (total_loss, grad_norm, every loss term) —
  the scanned-accumulation path itself, and
* a per-leaf gradient hash (L2 norm + dot with a fixed Rademacher
  probe vector) from the equivalent hand-rolled microbatch loop — the
  same loop ``test_train_accum.py`` proves equal to the scan, giving
  leaf-granular attribution when something drifts.

Any kernel/layout/criterion change that silently shifts training
gradients fails loudly.  Regenerate deliberately with
``python tests/test_train_frozen_numerics.py --regen`` after an
*intentional* numerics change, and say why in the commit message.

Reference counterpart: none (it ships no tests); the quantity guarded is
the backward of the full model+criterion
(``/root/reference/segdino3d/models/segdino3d.py`` forward +
``criterion`` losses) as one jittable step.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "train_grads_frozen.npz")

# scalar-metric and grad-hash drift allowance (CPU-vs-TPU, XLA versions);
# ordering/layout bugs shift whole layers and blow through this
RTOL = 5e-3


def _setup():
    import jax

    import __graft_entry__ as ge
    from segdino3d_tpu.data.collate import stack_batches
    from segdino3d_tpu.parallel.train_step import (create_train_state,
                                                   make_train_step)

    kw = dict(n_points=1024, s_cap=64, i_cap=16, k2d=16, batch=1,
              num_layers=2, d_model=64, n_sem=20, n_inst_cls=18, feat2d=32)
    model, criterion, _tc, variables, batch1 = ge._build(**kw)
    _, _, _, _, batch2 = ge._build(**dict(kw, seed=11))
    stacked = stack_batches([batch1, batch2])

    import optax

    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(1e-3, weight_decay=0.05))
    state = create_train_state(variables, tx, use_ema=False)
    key = jax.random.PRNGKey(3)
    step = make_train_step(model, criterion, tx, donate=False,
                           accum_steps=2)
    _, metrics = step(state, stacked, key)
    metrics = {k: float(v) for k, v in metrics.items()
               if np.ndim(v) == 0}

    # hand-rolled microbatch loop == the scan (test_train_accum.py); its
    # full gradient tree gives per-leaf attribution
    def loss_fn(params, bs, mb, r):
        (outputs, gt), mut = model.apply(
            {"params": params, "batch_stats": bs}, mb, True,
            rngs={"queries": r}, mutable=["batch_stats"])
        return sum(criterion(outputs, gt).values()), mut["batch_stats"]

    import jax

    bs = state.batch_stats
    grads = []
    for i, mb in enumerate([batch1, batch2]):
        r = jax.random.fold_in(key, i)
        (_t, bs), g = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(
            state.params, bs, mb, r)
        grads.append(g)
    mean_g = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
    flat = {"/".join(str(k.key) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(mean_g)[0]}
    names = sorted(flat)
    norms, probes = [], []
    for i, n in enumerate(names):
        g = flat[n].astype(np.float64).reshape(-1)
        sign = np.where(
            np.random.RandomState(1000 + i).rand(g.size) < 0.5, -1.0, 1.0)
        norms.append(np.sqrt((g * g).sum()))
        probes.append((g * sign).sum())
    return metrics, names, np.array(norms), np.array(probes)


@pytest.mark.slow
def test_accum_train_grads_match_fixture():
    assert os.path.exists(FIXTURE), "fixture missing — run --regen"
    ref = np.load(FIXTURE, allow_pickle=True)
    metrics, names, norms, probes = _setup()
    ref_metrics = ref["metrics"].item()
    assert set(metrics) == set(ref_metrics), (
        set(metrics) ^ set(ref_metrics))
    for k in sorted(ref_metrics):
        np.testing.assert_allclose(metrics[k], ref_metrics[k], rtol=RTOL,
                                   err_msg=f"metric {k}")
    assert list(ref["names"]) == names, "param tree changed — rerun --regen"
    scale = float(np.max(ref["norms"])) + 1e-12
    for i, n in enumerate(names):
        np.testing.assert_allclose(
            norms[i], ref["norms"][i], rtol=RTOL, atol=RTOL * scale,
            err_msg=f"grad norm drift at {n}")
        np.testing.assert_allclose(
            probes[i], ref["probes"][i], rtol=RTOL,
            atol=RTOL * max(abs(ref["probes"][i]), scale),
            err_msg=f"grad probe drift at {n}")


def regen():
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    metrics, names, norms, probes = _setup()
    np.savez_compressed(
        FIXTURE, metrics=np.array(metrics, dtype=object),
        names=np.array(names), norms=norms, probes=probes)
    print(f"wrote {FIXTURE}: {len(names)} leaves, "
          f"total_loss={metrics['total_loss']:.6f}, "
          f"grad_norm={metrics['grad_norm']:.6f}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        regen()
    else:
        print(__doc__)
