"""Checkpoint save/restore + pretrained merge + torch import tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdino3d_tpu.parallel.train_step import TrainState, create_train_state
from segdino3d_tpu.train.checkpoint import (merge_pretrained,
                                            restore_checkpoint,
                                            save_checkpoint)
from segdino3d_tpu.train.optim import build_optimizer


def tiny_state():
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)},
              "backbone": {"conv": {"kernel": jnp.full((2, 3), 2.0)}}}
    tx, _ = build_optimizer(dict(lr=1e-3), dict(total_iters=10))
    return create_train_state({"params": params, "batch_stats": {}}, tx,
                              use_ema=True), tx


class TestOrbaxRoundtrip:
    def test_save_restore(self, tmp_path):
        state, tx = tiny_state()
        state = state.replace(step=jnp.asarray(7, jnp.int32))
        save_checkpoint(str(tmp_path), jax.device_get(state))
        restored = restore_checkpoint(str(tmp_path), jax.device_get(state))
        assert restored is not None
        assert int(restored.step) == 7
        np.testing.assert_array_equal(
            np.asarray(restored.params["dense"]["kernel"]),
            np.ones((4, 4)))

    def test_restore_empty(self, tmp_path):
        state, _ = tiny_state()
        assert restore_checkpoint(str(tmp_path / "none"),
                                  jax.device_get(state)) is None


class TestMergePretrained:
    def test_partial_merge(self):
        params = {"a": {"w": jnp.zeros((2, 2))}, "b": {"w": jnp.zeros(3)}}
        pre = {"a": {"w": jnp.ones((2, 2))},
               "c": {"w": jnp.ones(5)},             # unknown -> skipped
               "b": {"w": jnp.ones(7)}}             # shape mismatch -> skipped
        out = merge_pretrained(params, pre)
        np.testing.assert_array_equal(np.asarray(out["a"]["w"]), np.ones((2, 2)))
        np.testing.assert_array_equal(np.asarray(out["b"]["w"]), np.zeros(3))


class TestTorchImport:
    def test_key_translation_and_transpose(self, tmp_path):
        import torch

        from segdino3d_tpu.train.torch_import import load_torch_checkpoint

        sd = {
            "module.backbone.conv0p1s1.kernel": torch.randn(125, 259, 32),
            "backbone.bn0.bn.weight": torch.ones(32),
            "backbone.bn0.bn.bias": torch.zeros(32),
            "backbone.block1.0.conv1.kernel": torch.randn(27, 32, 32),
            "decoder.input_proj.0.weight": torch.randn(256, 96),
            "decoder.input_proj.0.bias": torch.randn(256),
            "decoder.x_mask.0.weight": torch.randn(256, 96),
            "decoder.ca_qcontent_proj.3.weight": torch.randn(256, 256),
            "unknown.key": torch.randn(2),
        }
        p = str(tmp_path / "ckpt.pth")
        torch.save({"model": sd}, p)
        out = load_torch_checkpoint(p)
        assert out["backbone"]["unet"]["conv0p1s1"]["kernel"].shape == (125, 259, 32)
        assert out["backbone"]["unet"]["bn0"]["scale"].shape == (32,)
        # dense weights transposed to flax (in, out)
        assert out["decoder"]["input_proj_dense"]["kernel"].shape == (96, 256)
        assert out["decoder"]["ca_qcontent_proj_3"]["kernel"].shape == (256, 256)

    def test_kernel_permutation_involution(self):
        from segdino3d_tpu.train.torch_import import kernel_permutation

        for k in (2, 3, 5):
            perm = kernel_permutation(k, "x_fastest")
            # applying twice returns identity (transpose symmetric in x/z swap)
            double = perm[perm]
            np.testing.assert_array_equal(double, np.arange(k ** 3))


class TestPreemptionSave:
    def test_sigterm_checkpoints_and_exits_cleanly(self, tmp_path):
        """A SIGTERM mid-loop must checkpoint at the next step boundary
        and return (clean preemption) instead of killing the process;
        training must be resumable from that checkpoint."""
        import os
        import signal
        import threading

        from segdino3d_tpu.train.checkpoint import latest_step
        from segdino3d_tpu.train.engine import train_loop

        state, _ = tiny_state()

        def step_fn(state, batch, rng):
            import time as _t
            _t.sleep(0.05)
            return (state.replace(step=state.step + 1),
                    {"total_loss": jnp.asarray(1.0)})

        class Loader:
            def __iter__(self):
                import itertools
                return itertools.count()

        # deliver SIGTERM to ourselves shortly after the loop starts
        timer = threading.Timer(
            0.4, lambda: os.kill(os.getpid(), signal.SIGTERM))
        timer.start()
        try:
            out = train_loop(step_fn=step_fn, state=state, train_loader=Loader(),
                             num_iterations=10_000, print_freq=10_000,
                             save_step=10_000, work_dir=str(tmp_path))
        finally:
            timer.cancel()
        done = int(out.step)
        assert 0 < done < 10_000          # exited early, after >=1 step
        assert latest_step(str(tmp_path)) == done
        restored = restore_checkpoint(str(tmp_path), jax.device_get(state))
        assert int(restored.step) == done
        # handlers restored: SIGTERM disposition is back to the default
        assert signal.getsignal(signal.SIGTERM) in (
            signal.SIG_DFL, signal.default_int_handler)
