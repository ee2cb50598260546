"""Fused masked multi-head attention primitives (padded dense batches).

The reference decoder loops over ragged per-scene tensors with a custom
projection-free torch MHA (``/root/reference/segdino3d/models/module/
attention.py:186-396``).  Here attention runs as batched einsums over padded
(B, Q, S) tensors — XLA fuses the mask/softmax chain and maps the matmuls
onto the MXU.  Semantics parity notes:

* ``blocked`` masks use True = not allowed (torch ``attn_mask`` convention);
* softmax is max-subtracted (reference ``attention.py:381-382``);
* rows with every key blocked produce **zero** output instead of NaN (the
  reference resets such rows before attention for real queries; padded rows
  only exist here).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_softmax(logits: jnp.ndarray, blocked: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Stable softmax over the last axis with a True=blocked mask.

    All-blocked rows return all-zero probabilities.
    """
    if blocked is not None:
        neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        logits = jnp.where(blocked, neg, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - jax.lax.stop_gradient(m))
    if blocked is not None:
        e = jnp.where(blocked, 0.0, e)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(denom, jnp.asarray(1e-30, logits.dtype))


def multi_head_attention(
    q: jnp.ndarray,              # (B, Q, Dq)  pre-projected
    k: jnp.ndarray,              # (B, S, Dq)  pre-projected
    v: jnp.ndarray,              # (B, S, Dv)  pre-projected
    num_heads: int,
    blocked: Optional[jnp.ndarray] = None,  # (B, Q, S) or (B, 1, S) True=blocked
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Projection-free MHA core. Returns (B, Q, Dv) — caller applies out_proj.

    ``scale`` defaults to (Dq/num_heads)^-0.5, matching the reference's
    scaling by the query head dim even when q/k are concat-PE doubles
    (``attention.py:282-287``).
    """
    b, nq, dq = q.shape
    s = k.shape[1]
    dv = v.shape[2]
    hd_q = dq // num_heads
    hd_v = dv // num_heads
    if scale is None:
        scale = float(hd_q) ** -0.5

    qh = q.reshape(b, nq, num_heads, hd_q)
    kh = k.reshape(b, s, num_heads, hd_q)
    vh = v.reshape(b, s, num_heads, hd_v)

    # logits/softmax stay f32 even for bf16 q/k (the MXU accumulates f32
    # anyway; bf16 exp/normalize would cost real mask-threshold precision),
    # probabilities cast back so the AV matmul runs at the input dtype
    logits = jnp.einsum("bqhd,bshd->bhqs", qh * scale, kh,
                        preferred_element_type=jnp.float32)
    if blocked is not None:
        blocked = blocked[:, None, :, :]  # broadcast over heads
    p = masked_softmax(logits, blocked).astype(v.dtype)
    out = jnp.einsum("bhqs,bshd->bqhd", p, vh)
    return out.reshape(b, nq, dv)
