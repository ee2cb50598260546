"""Checkpoint save / resume (orbax).

Parity target: the reference's periodic ``torch.save({model, args,
optimizer, step, ema_model})`` + ``resume``/``load_model``
(``/root/reference/engine/train_engine_3d.py:142-164``,
``utils/ckpt_utils.py:10-113``).  Checkpoints are orbax pytrees under
``work_dir/checkpoints/step_<N>``; ``load_pretrained`` merges a partial
params tree (strict=False analog) for backbone warm starts.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(work_dir: str) -> str:
    return os.path.join(os.path.abspath(work_dir), "checkpoints")


def save_checkpoint(work_dir: str, state, keep: int = 5):
    path = _ckpt_dir(work_dir)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)) as mgr:
        mgr.save(int(state.step), args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


class CheckpointWriter:
    """Async periodic checkpointing for the train loop.

    The reference blocks its hot loop on every ``torch.save``
    (``engine/train_engine_3d.py:145-164``); orbax's async manager
    serializes from the host copy in a background thread instead, so the
    loop only pays the ``device_get``.  ``close()`` (or the context exit)
    drains pending writes — call it before reading the checkpoints back.
    """

    def __init__(self, work_dir: str, keep: int = 5):
        path = _ckpt_dir(work_dir)
        os.makedirs(path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, enable_async_checkpointing=True))

    def save(self, state):
        """Non-blocking save of a HOST-side state (pass
        ``jax.device_get(state)``; the caller must not mutate it)."""
        self._mgr.save(int(state.step), args=ocp.args.StandardSave(state))

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def latest_step(work_dir: str) -> Optional[int]:
    path = _ckpt_dir(work_dir)
    if not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(path) as mgr:
        return mgr.latest_step()


def restore_checkpoint(work_dir: str, abstract_state):
    """Restore the latest checkpoint into the given state structure."""
    path = _ckpt_dir(work_dir)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            return None
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))


def merge_pretrained(params: Any, pretrained: Any) -> Any:
    """strict=False load: overwrite leaves present in ``pretrained``
    (matching path + shape), keep the rest (reference ``load_model``,
    ``utils/ckpt_utils.py:85-113``)."""
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_src = dict(jax.tree_util.tree_flatten_with_path(pretrained)[0])
    loaded, skipped = 0, 0
    out = dict(flat_p)
    for k, v in flat_src.items():
        if k in flat_p and flat_p[k].shape == v.shape:
            out[k] = v
            loaded += 1
        else:
            skipped += 1
    treedef = jax.tree_util.tree_structure(params)
    leaves = [out[k] for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    result = jax.tree_util.tree_unflatten(treedef, leaves)
    if skipped:
        print(f"[checkpoint] merged pretrained: {loaded} loaded, "
              f"{skipped} skipped (missing/shape-mismatch)")
    return result
