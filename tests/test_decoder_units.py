"""Unit parity tests for decoder building blocks (PE, masked MHA)."""
import math

import jax.numpy as jnp
import numpy as np
import torch

from segdino3d_tpu.ops.attention import multi_head_attention
from segdino3d_tpu.ops.pos_embed import shift_scale_points, sine_pos_embed
from segdino3d_tpu.models.decoder.query_decoder import inverse_sigmoid


def torch_sine_pe(xyz, num_channels, rng_min, rng_max, temperature, scale):
    """Reference formula re-derivation (numpy/torch): per-dim interleaved
    sin/cos with temperature**(2*(i//2)/cdim) frequencies over normalized
    coordinates."""
    xyz = (xyz - rng_min) / (rng_max - rng_min)
    d_in = xyz.shape[-1]
    ndim = num_channels // d_in
    if ndim % 2 == 1:
        ndim -= 1
    rems = num_channels - ndim * d_in
    outs = []
    for d in range(d_in):
        cdim = ndim
        if rems > 0:
            cdim += 2
            rems -= 2
        dim_t = temperature ** (2 * (np.arange(cdim) // 2) / cdim)
        pos = (xyz[:, d:d + 1] * scale) / dim_t[None, :]
        emb = np.empty_like(pos)
        emb[:, 0::2] = np.sin(pos[:, 0::2])
        emb[:, 1::2] = np.cos(pos[:, 1::2])
        outs.append(emb)
    return np.concatenate(outs, -1)


class TestPE:
    def test_sine_matches_reference_formula(self):
        rng = np.random.RandomState(0)
        n, c = 40, 256
        xyz = rng.uniform(-2, 5, (n, 3)).astype(np.float32)
        mn = xyz.min(0) - 0.1
        mx = xyz.max(0) + 0.1
        got = sine_pos_embed(
            jnp.asarray(xyz)[None], c,
            (jnp.asarray(mn)[None], jnp.asarray(mx)[None]),
            temperature=20.0)[0]
        ref = torch_sine_pe(xyz, c, mn, mx, 20.0, 2 * math.pi)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=1e-4)

    def test_modulated(self):
        rng = np.random.RandomState(1)
        xyz = rng.uniform(0, 1, (10, 3)).astype(np.float32)
        mod = rng.uniform(0.5, 2, (10, 3)).astype(np.float32)
        rngs = (jnp.zeros((1, 3)), jnp.ones((1, 3)))
        base = np.asarray(sine_pos_embed(jnp.asarray(xyz)[None], 24, rngs,
                                         temperature=20.0)[0])
        modded = np.asarray(sine_pos_embed(jnp.asarray(xyz)[None], 24, rngs,
                                           temperature=20.0,
                                           modulated=jnp.asarray(mod)[None])[0])
        # each dim's 8-channel block is scaled by mod[:, d]
        for d in range(3):
            np.testing.assert_allclose(
                modded[:, d * 8:(d + 1) * 8],
                base[:, d * 8:(d + 1) * 8] * mod[:, d:d + 1], rtol=1e-5)


class TestMaskedMHA:
    def test_matches_torch_projection_free(self):
        """Projection-free MHA core vs the same computation in torch
        (pre-projected q/k/v, q/k dim may be 2x the v dim)."""
        rng = np.random.RandomState(2)
        B, Q, S, H, D = 2, 6, 9, 4, 32
        q = rng.randn(B, Q, 2 * D).astype(np.float32)
        k = rng.randn(B, S, 2 * D).astype(np.float32)
        v = rng.randn(B, S, D).astype(np.float32)
        blocked = rng.rand(B, Q, S) > 0.7
        blocked[:, :, 0] = False  # keep at least one key attendable

        scale = float(2 * D // H) ** -0.5
        got = np.asarray(multi_head_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
            blocked=jnp.asarray(blocked), scale=scale))

        # torch reference computation
        tq = torch.tensor(q).view(B, Q, H, -1).permute(0, 2, 1, 3)
        tk = torch.tensor(k).view(B, S, H, -1).permute(0, 2, 1, 3)
        tv = torch.tensor(v).view(B, S, H, -1).permute(0, 2, 1, 3)
        logits = (tq * scale) @ tk.transpose(-1, -2)
        logits = logits.masked_fill(torch.tensor(blocked)[:, None], -torch.inf)
        attn = torch.softmax(logits, -1)
        ref = (attn @ tv).permute(0, 2, 1, 3).reshape(B, Q, D).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_all_blocked_rows_zero(self):
        q = jnp.ones((1, 2, 8))
        k = jnp.ones((1, 3, 8))
        v = jnp.ones((1, 3, 8))
        blocked = jnp.asarray([[[True, True, True], [False, True, True]]])
        out = np.asarray(multi_head_attention(q, k, v, 2, blocked=blocked))
        assert (out[0, 0] == 0).all()
        assert (out[0, 1] != 0).any()


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.01, 0.3, 0.7, 0.99])
    y = 1 / (1 + np.exp(-np.asarray(inverse_sigmoid(x))))
    np.testing.assert_allclose(y, np.asarray(x), rtol=1e-4)
