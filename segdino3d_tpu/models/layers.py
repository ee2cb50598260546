"""Shared nn building blocks (flax.linen) for sparse voxel networks."""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid voxels only (sparse-tensor batch norm).

    Equivalent of ``ME.MinkowskiBatchNorm`` / spconv's ``nn.BatchNorm1d`` over
    the voxel dimension (reference: ``minkunet.py:28-30``, eps/momentum per
    ``spconvunet.py:36`` for the spconv path).  Batch statistics are computed
    over valid rows; invalid rows are zeroed on output.
    """
    momentum: float = 0.1       # torch convention: running = (1-m)*running + m*batch
    eps: float = 1e-5
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, valid, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average)
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = valid.astype(jnp.float32)
            n = jnp.maximum(w.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * w[:, None]).sum(0) / n
            var = (jnp.square(xf - mean) * w[:, None]).sum(0) / n
            if not self.is_initializing():
                m = self.momentum
                # torch uses the unbiased variance for the running estimate
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        y = y.astype(x.dtype)
        return jnp.where(valid[:, None], y, 0.0)


class MLP(nn.Module):
    """k-layer ReLU MLP (reference ``segdino3d/models/module/utils.py:167-179``)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    last_zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            dim = self.output_dim if is_last else self.hidden_dim
            if is_last and self.last_zero_init:
                x = nn.Dense(dim, kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros, name=f"layers_{i}")(x)
            else:
                x = nn.Dense(dim, name=f"layers_{i}")(x)
            if not is_last:
                x = nn.relu(x)
        return x
