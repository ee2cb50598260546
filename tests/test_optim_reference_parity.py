"""Optimizer/scheduler numerics vs the *executed* torch counterparts.

The reference trains with ``torch.optim.AdamW(lr=1e-4, weight_decay=0.05)``
+ ``PolynomialLR(power=0.9, total_iters=num_iterations)`` and
``clip_grad_norm_(10)`` (``/root/reference/utils/train_utils.py:91-115``,
``engine/train_engine_3d.py:113-116``).  These tests run torch (CPU) side
by side with our optax chain (``segdino3d_tpu/train/optim.py``) so the
training-dynamics parity claim is executed, not derived:

- the PolynomialLR lr trajectory (incl. the post-``total_iters`` clamp),
- multi-step AdamW parameter trajectories (decoupled wd, bias correction,
  eps placement) under the poly schedule,
- global-norm gradient clipping composed with the step,
- the two-group (main / lr_backbone) split mirroring ``get_param_dict``'s
  name-substring grouping (``utils/common_utils.py:60-105``).
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from segdino3d_tpu.train.optim import build_optimizer, poly_lr


def _torch_groups(params_np, lr, lr_backbone):
    main, back = [], []
    for name, arr in params_np.items():
        t = torch.nn.Parameter(torch.from_numpy(arr.copy()).double())
        (back if "backbone" in name else main).append((name, t))
    groups = [{"params": [t for _, t in main], "lr": lr}]
    if back:
        groups.append({"params": [t for _, t in back], "lr": lr_backbone})
    return main + back, groups


class TestPolyLR:
    @pytest.mark.parametrize("total,power", [(40, 0.9), (7, 1.0), (100, 0.5)])
    def test_trajectory_matches_torch(self, total, power):
        base_lr = 1e-4
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.AdamW([p], lr=base_lr)
        sched = torch.optim.lr_scheduler.PolynomialLR(
            opt, total_iters=total, power=power)
        ours = poly_lr(base_lr, total, power)
        # the reference steps the scheduler after each optimizer step
        # (train_engine_3d.py:117): lr used at step i is the value BEFORE
        # the i-th scheduler.step(). Walk past total_iters to check clamp.
        for step in range(total + 10):
            torch_lr = opt.param_groups[0]["lr"]
            np.testing.assert_allclose(float(ours(step)), torch_lr,
                                       rtol=1e-5, atol=1e-12,
                                       err_msg=f"step {step}")
            opt.step()
            sched.step()


class TestAdamWParity:
    """Multi-step parameter trajectories, torch fp64 vs our optax in fp64."""

    def _run(self, lr_backbone=None, clip=None, steps=6, total=20):
        rng = np.random.RandomState(0)
        names = ["decoder_w", "decoder_b", "backbone_k"]
        params_np = {n: rng.randn(4, 3).astype(np.float64) for n in names}
        grads_np = [
            {n: rng.randn(4, 3).astype(np.float64) for n in names}
            for _ in range(steps)
        ]
        lr, wd = 1e-2, 0.05  # big lr so drift is visible above tolerance

        # ---- torch ----
        named, groups = _torch_groups(
            params_np, lr, lr_backbone if lr_backbone else lr)
        opt = torch.optim.AdamW(groups, lr=lr, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=wd)
        sched = torch.optim.lr_scheduler.PolynomialLR(
            opt, total_iters=total, power=0.9)
        for g in grads_np:
            for name, t in named:
                t.grad = torch.from_numpy(g[name].copy()).double()
            if clip is not None:
                torch.nn.utils.clip_grad_norm_([t for _, t in named], clip)
            opt.step()
            sched.step()
        torch_out = {name: t.detach().numpy() for name, t in named}

        # ---- ours (fp64, matching the torch-double run bit-for-bit-ish) ----
        with jax.enable_x64(True):
            cfg_opt = {"lr": lr, "weight_decay": wd}
            if lr_backbone:
                cfg_opt["lr_backbone"] = lr_backbone
            tx, _ = build_optimizer(cfg_opt,
                                    {"total_iters": total, "power": 0.9},
                                    clip_max_norm=clip)
            params = {n: jnp.asarray(v) for n, v in params_np.items()}
            state = tx.init(params)
            for g in grads_np:
                gj = {n: jnp.asarray(v) for n, v in g.items()}
                updates, state = tx.update(gj, state, params)
                params = jax.tree_util.tree_map(lambda p, u: p + u,
                                                params, updates)
            out = {n: np.asarray(params[n]) for n in names}
        # rtol 1e-7: fp64 op-ordering noise only (torch divides by
        # sqrt(bias_correction2) as a separate step; optax folds it into
        # v_hat). A semantic difference — eps placement, coupled wd, wrong
        # bias correction — shows up at 1e-4+ under lr=1e-2.
        for n in names:
            np.testing.assert_allclose(
                out[n], torch_out[n], rtol=1e-7, atol=1e-12, err_msg=n)

    def test_single_group(self):
        self._run()

    def test_backbone_group_lr(self):
        self._run(lr_backbone=1e-3)

    def test_with_global_norm_clip(self):
        # clip small enough that it actually rescales every step; torch
        # divides by (norm + 1e-6) — indistinguishable at this tolerance
        self._run(clip=0.5)

    def test_clip_and_groups_compose(self):
        self._run(lr_backbone=1e-3, clip=0.5)
