"""On-device boolean bit-packing for device->host mask transfer.

The eval driver ships per-scene instance point-masks to the host —
``(topk_insts, num_points)`` bool is ~78 MB per 131k-point scene at the
default 600 slots, and it dominates eval's device->host traffic (the
reference never pays this: its masks stay on one CUDA device,
``baseline3d.py:373-486``, and scipy evaluates there-side).  Packing to
one bit per point on device cuts the transfer 8x; the host unpacks with
``np.unpackbits`` (little-endian bit order matches the weighting here).

Pure XLA: reshape + an 8-wide weighted reduction — fuses into the
producing computation, no gather/scatter.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_WEIGHTS = 2 ** np.arange(8, dtype=np.int32)   # little-endian bit order


def pack_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Pack bools along the last axis: ``(..., N) -> (..., ceil(N/8))``
    uint8.  ``N`` is padded up to a multiple of 8 with zeros."""
    n = x.shape[-1]
    rem = (-n) % 8
    if rem:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, rem)]
        x = jnp.pad(x, pad)
    g = x.reshape(x.shape[:-1] + ((n + rem) // 8, 8))
    return (g.astype(jnp.int32) * _WEIGHTS).sum(-1).astype(jnp.uint8)


def unpack_bits_np(packed: np.ndarray, count: int) -> np.ndarray:
    """Host-side inverse: ``(..., M) uint8 -> (..., count) bool``."""
    out = np.unpackbits(np.asarray(packed, dtype=np.uint8), axis=-1,
                        bitorder="little")
    return out[..., :count].astype(bool)
