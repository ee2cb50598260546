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
                    stacked_batch: bool = False) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    ``stacked_batch``: the batch pytree carries a leading per-device axis
    (``collate.stack_batches``) — required when host-built sparse plans ride
    along, since plan arrays have no scene axis to shard.
    """

    def local_step(state: TrainState, batch, rng):
        if mesh is not None:
            # decorrelate per-device query subsampling
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        if stacked_batch:
            batch = jax.tree_util.tree_map(lambda x: x[0], batch)

        def loss_fn(params):
            (outputs, gt), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, True, rngs={"queries": rng}, mutable=["batch_stats"])
            losses = criterion(outputs, gt)
            total = sum(losses.values())
            return total, (losses, mut["batch_stats"])

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

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
