"""Jitted train / eval steps over the device mesh.

The whole reference training iteration — forward, loss, AMP-free backward,
grad clip, AdamW step, PolyLR, EMA update, loss all-reduce
(``/root/reference/engine/train_engine_3d.py:88-141``) — compiles into ONE
XLA program per bucket shape.  Data parallelism runs as ``shard_map`` over
the ``data`` mesh axis: each device computes its local scenes' gradients,
``pmean`` reduces over ICI (the DDP bucket all-reduce, ``train_3d.py:149``),
and the optimizer/EMA update is computed replicated.

EMA note: the reference shards EMA state across ranks through the
*filesystem* (``utils/ema_utils.py:17-55``) to save GPU memory; on TPU the
EMA pytree simply lives in HBM next to the params (40M params ≈ 160 MB) and
updates inside the same compiled step.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from segdino3d_tpu.parallel.mesh import shard_map


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None


def create_train_state(variables, tx, use_ema=False):
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
    )


def make_train_step(model, criterion, tx, *,
                    ema_decay: Optional[float] = None,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    stacked_batch: bool = False,
                    accum_steps: int = 1) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    ``stacked_batch``: the batch pytree carries a leading per-device axis
    (``collate.stack_batches``) — required when host-built sparse plans ride
    along, since plan arrays have no scene axis to shard.

    ``accum_steps`` > 1: gradient accumulation — the (per-device) batch
    pytree carries a leading microbatch axis of that length
    (``collate.stack_batches`` over ``accum_steps`` sub-batches; the
    loaders emit it via ``mesh_shards = n_devices * accum_steps``) and the
    step ``lax.scan``s the forward/backward over it, averaging gradients
    and losses.  This runs the reference's bs=4 single-GPU recipe
    (``/root/reference/scripts/train.sh:6,20``,
    ``configs/prototypes/SegDINO3D_ScanNet200.py:45,73``) on one 16G chip,
    where a monolithic batch-4 forward OOMs on activation temporaries.
    Gradients/losses match the monolithic batch exactly for every
    batch-size-linear term (the criterion is a mean of per-scene losses;
    ``fix_dice_loss_weight``'s ``×4/bs`` arithmetic commutes with the
    microbatch mean) — the one deviation is train-mode BatchNorm, which
    normalizes each microbatch by its own statistics and applies its
    running-average momentum once per microbatch (the reference's batch-4
    BN sees all four scenes jointly).
    """

    def local_step(state: TrainState, batch, rng):
        if mesh is not None:
            # decorrelate per-device query subsampling
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        if stacked_batch and accum_steps == 1:
            batch = jax.tree_util.tree_map(lambda x: x[0], batch)

        def loss_fn(params, batch_stats, mb, mb_rng):
            (outputs, gt), mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                mb, True, rngs={"queries": mb_rng},
                mutable=["batch_stats"])
            losses = criterion(outputs, gt)
            total = sum(losses.values())
            return total, (losses, mut["batch_stats"])

        if accum_steps > 1:
            # microbatch axis must be present and of the declared length
            lead = {x.shape[0] for x in jax.tree_util.tree_leaves(batch)
                    if hasattr(x, "shape") and x.ndim > 0}
            if lead != {accum_steps}:
                raise ValueError(
                    f"accum_steps={accum_steps} but batch leading axes are "
                    f"{sorted(lead)} — stack {accum_steps} microbatches "
                    f"(collate.stack_batches / loader mesh_shards)")
            mb0 = jax.tree_util.tree_map(lambda x: x[0], batch)
            l_shapes = jax.eval_shape(
                loss_fn, state.params, state.batch_stats, mb0, rng)[1][0]
            zeros = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), l_shapes)
            g_zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)

            def body(carry, xs):
                bs, g_acc, l_acc, t_acc = carry
                mb, i = xs
                r = jax.random.fold_in(rng, i)
                (t, (ls, new_bs)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, bs, mb, r)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                l_acc = jax.tree_util.tree_map(jnp.add, l_acc, ls)
                return (new_bs, g_acc, l_acc, t_acc + t), None

            (new_bs, g_sum, l_sum, t_sum), _ = jax.lax.scan(
                body,
                (state.batch_stats, g_zero, zeros, jnp.zeros((), jnp.float32)),
                (batch, jnp.arange(accum_steps)))
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
            losses = jax.tree_util.tree_map(lambda x: x * inv, l_sum)
            total = t_sum * inv
        else:
            (total, (losses, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       batch, rng)

        if mesh is not None:
            grads = jax.lax.pmean(grads, "data")
            losses = jax.lax.pmean(losses, "data")
            total = jax.lax.pmean(total, "data")
            new_bs = jax.lax.pmean(new_bs, "data")

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            from segdino3d_tpu.train.ema import ema_update

            new_ema = ema_update(state.ema_params, new_params, ema_decay)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, ema_params=new_ema)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(local_step, donate_argnums=(0,) if donate else ())

    sharded = shard_map(
        local_step, mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
