"""Iteration-based training engine.

Parity target: ``train_multi_loader_step_3d``
(``/root/reference/engine/train_engine_3d.py:12-184``): infinite iteration
over the train loader, one fused train step (fwd/bwd/clip/AdamW/PolyLR/EMA),
loss logging with windowed meters, periodic checkpoint save and in-loop
evaluation.  AMP/GradScaler (:55,99-110) is unnecessary — TPUs run bf16
natively without loss scaling.
"""
from __future__ import annotations

import signal
import threading
import time
from typing import Callable, Optional

import jax
import numpy as np

from segdino3d_tpu.train.checkpoint import CheckpointWriter
from segdino3d_tpu.utils import profiling
from segdino3d_tpu.utils.metrics import MetricLogger


class _PreemptionGuard:
    """Save-on-signal support for the train loop.

    TPU pods get a SIGTERM on preemption/maintenance; the reference loop
    (``train_engine_3d.py:88-120``) dies and loses up to ``save_step``
    iterations.  While armed, the first SIGTERM/SIGINT only sets a flag —
    the loop checkpoints at the next step boundary and returns cleanly.
    The previous handler is restored on the first signal, so a second
    signal behaves normally (hard kill).  No-op when not on the main
    thread (signal.signal would raise)."""

    def __init__(self):
        self.signum = None
        self._prev = {}

    def __enter__(self):
        if threading.current_thread() is not threading.main_thread():
            return self
        for s in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[s] = signal.signal(s, self._on_signal)
            except (ValueError, OSError):   # non-main ctx / unsupported
                pass
        return self

    def _on_signal(self, signum, frame):
        self.signum = signum
        self._restore()

    def _restore(self):
        for s, h in self._prev.items():
            try:
                signal.signal(s, h)
            except (ValueError, OSError):
                pass
        self._prev = {}

    def __exit__(self, *exc):
        self._restore()
        return False


def train_loop(*,
               step_fn: Callable,
               state,
               train_loader,
               num_iterations: int,
               schedule_fn=None,
               logger=None,
               print_freq: int = 10,
               save_step: int = 1000,
               eval_step: Optional[int] = None,
               eval_fn: Optional[Callable] = None,
               work_dir: Optional[str] = None,
               seed: int = 0,
               eval_first: bool = False,
               profile_steps: Optional[tuple] = None):
    """Run the training loop; returns the final state.

    ``profile_steps=(start, stop)`` captures a ``jax.profiler`` trace of
    those steps into ``work_dir/profile`` (view with xprof/TensorBoard) —
    the TPU-native upgrade over the reference's wall-clock/max-memory
    meters (``utils/metric_utils.py:175-208``)."""
    metric_logger = MetricLogger(logger=logger)
    rng = jax.random.PRNGKey(seed)

    if eval_first and eval_fn is not None:
        eval_fn(state)

    start_step = int(state.step)
    it = iter(train_loader)
    t_end = time.time()
    writer = CheckpointWriter(work_dir) if work_dir else None
    last_saved = -1
    with _PreemptionGuard() as guard:
        for step in range(start_step, num_iterations):
            if profile_steps and work_dir and step == profile_steps[0]:
                import os as _os

                profiling.start_trace(_os.path.join(work_dir, "profile"))
                (logger.info if logger else print)(
                    f"profiling steps {profile_steps[0]}..{profile_steps[1]} "
                    f"-> {work_dir}/profile")
            batch = next(it)
            data_t = time.time() - t_end
            rng, sub = jax.random.split(rng)
            with profiling.annotate("train_step"):
                state, metrics = step_fn(state, batch, sub)
            if step % print_freq == 0:
                host_metrics = {k: float(v) for k, v in metrics.items()}
                lr = float(schedule_fn(step)) if schedule_fn else float("nan")
                metric_logger.update(lr=lr, data_time=data_t, **host_metrics)
                iter_t = time.time() - t_end
                msg = (f"iter [{step}/{num_iterations}] "
                       + "  ".join(f"{k}: {v:.4f}"
                                   for k, v in host_metrics.items())
                       + f"  lr: {lr:.3e}  time: {iter_t:.3f}s")
                (logger.info if logger else print)(msg)
            t_end = time.time()

            if profile_steps and work_dir and step == profile_steps[1]:
                jax.block_until_ready(metrics["total_loss"])
                profiling.stop_trace()
                (logger.info if logger else print)(
                    profiling.device_memory_summary())
            if writer and save_step and (step + 1) % save_step == 0:
                # async: serialization overlaps the next steps
                writer.save(jax.device_get(state))
                last_saved = int(state.step)
            if (eval_fn is not None and eval_step
                    and (step + 1) % eval_step == 0):
                eval_fn(state)
            if guard.signum is not None:
                # preemption/interrupt: checkpoint at this step boundary
                # and return cleanly (the final save below covers it)
                (logger.info if logger else print)(
                    f"signal {guard.signum} received: checkpointing at "
                    f"step {step + 1} and exiting the train loop")
                break

    if writer:
        if int(state.step) != last_saved:
            writer.save(jax.device_get(state))
        writer.close()
    return state
