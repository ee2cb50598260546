"""Optimizer + LR schedule (optax).

Parity target: AdamW lr=1e-4 wd=0.05 + PolynomialLR(power=0.9) over
``num_iterations`` with per-group LRs (main / backbone / text encoder)
(``/root/reference/utils/train_utils.py:91-115``,
``configs/schedules/adamw_polylr_3d.py``, param grouping
``utils/common_utils.py:49-247``).  Torch's PolynomialLR multiplies the
base lr by ``(1 - step/total)^power``.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import optax


def poly_lr(base_lr: float, total_iters: int, power: float = 0.9):
    def schedule(step):
        frac = jnp.clip(1.0 - step / total_iters, 0.0, 1.0)
        return base_lr * frac ** power
    return schedule


def _is_backbone(path) -> bool:
    return any("backbone" in str(k).lower() for k in path)


def build_optimizer(cfg_optimizer: Dict, cfg_scheduler: Dict,
                    clip_max_norm: Optional[float] = None):
    """Returns (optax transform, schedule_fn for logging).

    ``param_dict_type='default'`` uses lr for everything except parameters
    under a ``backbone`` scope which get lr_backbone (reference
    ``get_param_dict`` name-substring split).
    """
    lr = cfg_optimizer.get("lr", 1e-4)
    lr_backbone = cfg_optimizer.get("lr_backbone", lr)
    wd = cfg_optimizer.get("weight_decay", 0.05)
    total = cfg_scheduler.get("total_iters", 100_000)
    power = cfg_scheduler.get("power", 0.9)

    main_sched = poly_lr(lr, total, power)
    bb_sched = poly_lr(lr_backbone, total, power)

    def make(sched):
        return optax.adamw(learning_rate=sched, b1=0.9, b2=0.999,
                           eps=1e-8, weight_decay=wd)

    if lr_backbone == lr:
        tx = make(main_sched)
    else:
        def label_fn(params):
            import jax
            return jax.tree_util.tree_map_with_path(
                lambda p, _: "backbone" if _is_backbone(p) else "main", params)
        tx = optax.multi_transform(
            {"main": make(main_sched), "backbone": make(bb_sched)}, label_fn)

    if clip_max_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_max_norm), tx)
    return tx, main_sched
