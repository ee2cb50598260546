"""Vectorized multi-table coordinate hash for sparse voxel lookups.

The TPU-native equivalent of MinkowskiEngine/spconv's GPU coordinate hash
maps (reference dependency N1/N2 in SURVEY.md 搂2.2): coordinates are packed
into (hi, lo) int32 pairs and inserted into K open-addressed tables with
independent hash functions.  A lookup is K *parallel-within-round* gather
rounds — each round is one big batched gather over every query, so the
serial depth is K (vs ~17 for binary search), which is what matters on TPU
where a single 20M-element gather runs at ~3G elem/s but serialized rounds
dominate latency.

Insertion is collision-evicting: every key attempts table 0; losers retry
in table 1, etc.  With K=4 tables of size 2*capacity the probability of an
unplaced key is negligible; an ``overflow`` flag reports the pathological
case (callers assert in tests).

Determinism: scatter-min resolves insert races by smallest value id, so
table contents are order-independent and reproducible.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

EMPTY = jnp.int32(-1)
NUM_TABLES = 4

# distinct odd mixing constants per table (Knuth-style multiplicative)
_MIX = (
    (0x9E3779B1, 0x85EBCA77),
    (0xC2B2AE3D, 0x27D4EB2F),
    (0x165667B1, 0xD3A2646C),
    (0xFD7046C5, 0xB55A4F09),
)


def _hash(hi: jnp.ndarray, lo: jnp.ndarray, t: int, mask: int) -> jnp.ndarray:
    a = hi.astype(jnp.uint32) * jnp.uint32(_MIX[t][0])
    b = lo.astype(jnp.uint32) * jnp.uint32(_MIX[t][1])
    x = a ^ (b + jnp.uint32(0x9E3779B9) + (a << 6) + (a >> 2))
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x2C1B3C6D)
    x = x ^ (x >> 12)
    return (x & jnp.uint32(mask)).astype(jnp.int32)


class CoordHash(NamedTuple):
    """K tables of (key_hi, key_lo, value)."""
    t_hi: jnp.ndarray   # (K, T) int32, sentinel INT32_MAX where empty
    t_lo: jnp.ndarray   # (K, T)
    t_val: jnp.ndarray  # (K, T) int32, -1 where empty
    overflow: jnp.ndarray  # () bool

    @property
    def table_size(self) -> int:
        return self.t_hi.shape[1]


def build_hash(hi: jnp.ndarray, lo: jnp.ndarray, values: jnp.ndarray,
               valid: jnp.ndarray, capacity: int) -> CoordHash:
    """Insert (hi, lo) -> value. ``capacity`` = max number of valid keys;
    table size = next_pow2(2 * capacity)."""
    t_size = 1 << max(4, (2 * capacity - 1).bit_length())
    mask = t_size - 1
    sent = jnp.iinfo(jnp.int32).max

    t_hi = jnp.full((NUM_TABLES, t_size), sent, jnp.int32)
    t_lo = jnp.full((NUM_TABLES, t_size), sent, jnp.int32)
    t_val = jnp.full((NUM_TABLES, t_size), EMPTY, jnp.int32)

    n = hi.shape[0]
    pending = valid
    order = jnp.arange(n, dtype=jnp.int32)
    for t in range(NUM_TABLES):
        slot = _hash(hi, lo, t, mask)
        safe_slot = jnp.where(pending, slot, t_size)
        # claim: smallest row index wins the slot deterministically
        claim = jnp.full((t_size + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
        claim = claim.at[safe_slot].min(order)
        won = pending & (claim[jnp.clip(safe_slot, 0, t_size - 1)] == order)
        # winners have unique slots; losers scatter out-of-bounds (dropped)
        upd = jnp.where(won, slot, t_size)
        t_hi = t_hi.at[t, upd].set(hi, mode="drop")
        t_lo = t_lo.at[t, upd].set(lo, mode="drop")
        t_val = t_val.at[t, upd].set(values, mode="drop")
        pending = pending & ~won
    overflow = jnp.any(pending)
    return CoordHash(t_hi=t_hi, t_lo=t_lo, t_val=t_val, overflow=overflow)


def lookup_hash(h: CoordHash, q_hi: jnp.ndarray, q_lo: jnp.ndarray,
                q_valid=None) -> jnp.ndarray:
    """Batched lookup; returns value or -1. Any query shape."""
    mask = h.table_size - 1
    res = jnp.full(q_hi.shape, EMPTY, jnp.int32)
    for t in range(NUM_TABLES):
        slot = _hash(q_hi, q_lo, t, mask)
        hit = (h.t_hi[t][slot] == q_hi) & (h.t_lo[t][slot] == q_lo)
        res = jnp.where((res == EMPTY) & hit, h.t_val[t][slot], res)
    if q_valid is not None:
        res = jnp.where(q_valid, res, EMPTY)
    return res
