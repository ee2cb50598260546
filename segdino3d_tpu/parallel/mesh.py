"""Device mesh + sharding helpers.

TPU-native replacement of the reference's NCCL/DDP distribution layer
(``/root/reference/segdino3d/utils/dist_utils.py``, DDP wrap at
``train_3d.py:148-152``): instead of per-process NCCL groups, a
``jax.sharding.Mesh`` with a ``data`` axis carries data parallelism;
gradient all-reduce becomes a ``psum`` inside ``shard_map``; loss-dict
reduction (``utils/train_utils.py:49-75``) becomes a ``pmean``.  Multi-host
TPU slices initialize through ``jax.distributed.initialize`` — collectives
ride ICI within a slice and DCN across slices without any code change.

Axis layout: ``data`` (scene batch). Model axes (``model``) are declared for
future sharding of the 200-class mask head but currently size 1 — the model
at ~40M params is far below per-chip HBM.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


try:
    from jax import shard_map as _shard_map_mod  # jax >= 0.7 style

    def shard_map(f, mesh, in_specs, out_specs):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
except (ImportError, AttributeError):
    from jax.experimental.shard_map import shard_map as _sm

    def shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def make_mesh(n_data: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a SceneBatch pytree with the scene axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "ndim") and x.ndim > 0
        else x, batch)


def init_distributed():
    """Multi-host init (no-op on single host). The reference's env/SLURM
    rank parsing (``dist_utils.py:197-246``) is handled by
    ``jax.distributed.initialize`` reading the TPU runtime env."""
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process


def process_is_main() -> bool:
    return jax.process_index() == 0
