"""Vectorized multi-table coordinate hash for sparse voxel lookups.

The TPU-native equivalent of MinkowskiEngine/spconv's GPU coordinate hash
maps (reference dependency N1/N2 in SURVEY.md 搂2.2): coordinates are packed
into single uint32 keys (``keys.pack_coords_u32``) and inserted into K
open-addressed tables with independent hash functions.  A lookup is K
*parallel-within-round* gather rounds — each round is one batched gather of
key + value over every query, so the serial depth is K (vs ~17 for binary
search); a single 20M-element gather runs at ~1G elem/s on v5e while
serialized rounds dominate latency.

Insertion is collision-evicting: every key attempts table 0; losers retry
in table 1, etc.  With K=4 tables of size 2*capacity the probability of an
unplaced key is negligible; an ``overflow`` flag reports the pathological
case (callers assert in tests).

Determinism: scatter-min resolves insert races by smallest value id, so
table contents are order-independent and reproducible.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from segdino3d_tpu.ops.keys import U32_SENTINEL

# numpy scalar: no device-array creation at import time (see ops.keys)
EMPTY = np.int32(-1)
NUM_TABLES = 4

# distinct odd multiplicative constants per table
_MIX = (0x9E3779B1, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)


def _hash(key: jnp.ndarray, t: int, mask: int) -> jnp.ndarray:
    x = key * jnp.uint32(_MIX[t])
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x2C1B3C6D)
    x = x ^ (x >> 13)
    return (x & jnp.uint32(mask)).astype(jnp.int32)


class CoordHash(NamedTuple):
    """K tables of (key, value)."""
    t_key: jnp.ndarray  # (K, T) uint32, sentinel where empty
    t_val: jnp.ndarray  # (K, T) int32, -1 where empty
    overflow: jnp.ndarray  # () bool

    @property
    def table_size(self) -> int:
        return self.t_key.shape[1]


def build_hash(key: jnp.ndarray, values: jnp.ndarray,
               valid: jnp.ndarray, capacity: int) -> CoordHash:
    """Insert key -> value (key already sentinel-masked for invalid rows).
    Table size = next_pow2(2 * capacity)."""
    t_size = 1 << max(4, (2 * capacity - 1).bit_length())
    mask = t_size - 1

    t_key = jnp.full((NUM_TABLES, t_size), U32_SENTINEL, jnp.uint32)
    t_val = jnp.full((NUM_TABLES, t_size), EMPTY, jnp.int32)

    n = key.shape[0]
    pending = valid & (key != U32_SENTINEL)
    order = jnp.arange(n, dtype=jnp.int32)
    for t in range(NUM_TABLES):
        slot = _hash(key, t, mask)
        safe_slot = jnp.where(pending, slot, t_size)
        # claim: smallest row index wins the slot deterministically
        claim = jnp.full((t_size + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
        claim = claim.at[safe_slot].min(order)
        won = pending & (claim[jnp.clip(safe_slot, 0, t_size - 1)] == order)
        upd = jnp.where(won, slot, t_size)  # losers dropped
        t_key = t_key.at[t, upd].set(key, mode="drop")
        t_val = t_val.at[t, upd].set(values, mode="drop")
        pending = pending & ~won
    overflow = jnp.any(pending)
    return CoordHash(t_key=t_key, t_val=t_val, overflow=overflow)


def lookup_hash(h: CoordHash, key: jnp.ndarray, q_valid=None) -> jnp.ndarray:
    """Batched lookup; returns value or -1. Any query shape.

    Sentinel queries always miss (sentinel never equals a stored key)."""
    mask = h.table_size - 1
    res = jnp.full(key.shape, EMPTY, jnp.int32)
    unresolved = key != U32_SENTINEL
    for t in range(NUM_TABLES):
        slot = _hash(key, t, mask)
        k_t = h.t_key[t][slot]
        hit = unresolved & (k_t == key)
        res = jnp.where(hit, h.t_val[t][slot], res)
        # a key evicted to table t+1 implies its table-t slot was occupied;
        # an empty slot therefore proves absence -> those lanes stay -1
        unresolved = unresolved & ~hit & (k_t != U32_SENTINEL)
    if q_valid is not None:
        res = jnp.where(q_valid, res, EMPTY)
    return res
