"""Sine / Fourier positional embeddings over scene-normalized coordinates.

Parity target: ``PositionEmbeddingCoordsSine``
(``/root/reference/segdino3d/models/module/utils.py:23-164``) with
``shift_scale_points`` range normalization (``pc_util.py:48-…``):
coordinates are mapped to [0, 1] per scene via (x - min) / (max - min),
scaled by 2*pi, then per-dimension interleaved sin/cos with temperature
geometric frequencies.  ``modulated`` multiplies each spatial dim's block by
a per-point factor (box-modulated attention).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp


def shift_scale_points(xyz: jnp.ndarray,
                       src_range: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
    """(B, N, 3) coords -> [0,1]^3 given per-batch (min, max) each (B, 3)."""
    mn, mx = src_range
    extent = mx - mn
    return (xyz - mn[:, None, :]) / jnp.maximum(extent[:, None, :], 1e-12)


def fourier_pos_embed(xyz: jnp.ndarray,
                      gauss_b: jnp.ndarray,
                      num_channels: int,
                      src_range: Tuple[jnp.ndarray, jnp.ndarray],
                      modulated: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gaussian-Fourier positional features (reference
    ``get_fourier_embeddings``, utils.py:107-140): coordinates normalized
    to [0,1], optionally divided by per-point modulation, scaled by 2*pi,
    projected with a fixed Gaussian matrix, then [sin, cos]."""
    d_out = num_channels // 2
    x = shift_scale_points(xyz, src_range)
    if modulated is not None:
        x = x / modulated
    x = x * (2 * math.pi)
    proj = jnp.einsum("bnd,dk->bnk", x, gauss_b[:, :d_out])
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def sine_pos_embed(xyz: jnp.ndarray,
                   num_channels: int,
                   src_range: Tuple[jnp.ndarray, jnp.ndarray],
                   temperature: float = 10000.0,
                   scale: float = 2 * math.pi,
                   modulated: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, N, 3) -> (B, N, num_channels).

    Channel layout matches the reference: per spatial dim d a block of
    ``cdim`` channels (remainder distributed to leading dims in +2 steps),
    each block = interleave(sin(pos/t^(2i/cdim)), cos(...)).
    """
    xyz = shift_scale_points(xyz, src_range)
    d_in = xyz.shape[2]

    ndim = num_channels // d_in
    if ndim % 2 != 0:
        ndim -= 1
    rems = num_channels - ndim * d_in

    blocks = []
    for d in range(d_in):
        cdim = ndim
        if rems > 0:
            cdim += 2
            rems -= 2
        dim_t = jnp.arange(cdim, dtype=jnp.float32)
        dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / cdim)
        raw = xyz[:, :, d] * scale
        pos = raw[:, :, None] / dim_t
        emb = jnp.stack([jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])],
                        axis=3).reshape(*pos.shape[:2], -1)
        if modulated is not None:
            emb = emb * modulated[:, :, d:d + 1]
        blocks.append(emb)
    return jnp.concatenate(blocks, axis=2)
