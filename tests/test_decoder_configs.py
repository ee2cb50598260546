"""Decoder configuration matrix: every reference-supported prototype shape.

Covers VERDICT round-1 item #7: ``iter_pred=False`` simple path, learned
query embeddings (``num_instance_queries > 0``), and per-layer activation
checkpointing — each instantiated, run forward, and (where applicable)
differentiated.  ``iter_pred=False`` with positional embeddings is
intentionally unsupported: the reference itself crashes there (its
PE-mode ``cross_attn_layers`` are 2*d_model MultiheadAttention modules,
``instance_seg_3d_decoder.py:241-242``, which ``forward_simple`` calls
with d_model inputs, ``:595``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segdino3d_tpu.models.decoder.query_decoder import ScanNetQueryDecoder

B, S, Q, K, D, CIN = 2, 12, 10, 4, 32, 16
N_CLS, N_SEM = 5, 6


def _inputs(rng):
    f32 = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    scene_range = jnp.asarray(
        np.stack([np.full((B, 3), -1.0), np.full((B, 3), 1.0)], 1),
        jnp.float32)
    return dict(
        sp_feats=f32(B, S, CIN), sp_valid=jnp.ones((B, S), bool),
        sp_pos=f32(B, S, 3), sp_pos_wo_elastic=f32(B, S, 3),
        queries_feat=f32(B, Q, CIN), query_valid=jnp.ones((B, Q), bool),
        queries_pos=f32(B, Q, 3), dinox_queries=f32(B, K, D),
        dinox_query_pos=f32(B, K, 3), dinox_valid=jnp.ones((B, K), bool),
        scene_range=scene_range)


def _mk(**kw):
    base = dict(num_layers=2, num_instance_classes=N_CLS,
                num_semantic_classes=N_SEM, in_channels=CIN, d_model=D,
                num_heads=4, hidden_dim=64, dropout=0.0)
    base.update(kw)
    return ScanNetQueryDecoder(**base)


CONFIGS = {
    "pe_iter": dict(),   # shipped SegDINO3D config shape
    "plain_iter": dict(add_positional_embedding=False, box_modulate_ca=False,
                       add_box_size_pred=False,
                       normalize_box_prediction=False),
    "plain_simple": dict(iter_pred=False, add_positional_embedding=False,
                         box_modulate_ca=False, add_box_size_pred=False,
                         normalize_box_prediction=False),
    "plain_simple_nodinox": dict(iter_pred=False, add_dinox_query_ca=False,
                                 add_positional_embedding=False,
                                 box_modulate_ca=False,
                                 add_box_size_pred=False,
                                 normalize_box_prediction=False),
    "pe_iter_remat": dict(use_activation_checkpoint=True),
    "learned_queries": dict(iter_pred=False, num_instance_queries=7,
                            add_positional_embedding=False,
                            box_modulate_ca=False, add_box_size_pred=False,
                            normalize_box_prediction=False),
    "fourier_pe": dict(pos_type="fourier", box_modulate_ca=False),
}


class TestDecoderConfigMatrix:
    @pytest.mark.parametrize("name", sorted(CONFIGS))
    def test_forward(self, name):
        rng = np.random.RandomState(0)
        dec = _mk(**CONFIGS[name])
        inp = _inputs(rng)
        variables = dec.init({"params": jax.random.PRNGKey(0)}, **inp)
        out = dec.apply(variables, **inp)
        nq = Q + (7 if name == "learned_queries" else 0)
        if name == "learned_queries":
            nq = 7   # num_instance_queries > 0: learned only (reference
            #          builds query_proj only when num_instance_queries==0)
        assert out["cls_preds"].shape == (B, nq, N_CLS + 1)
        assert out["masks"].shape == (B, nq, S)
        assert out["sem_preds"].shape == (B, nq, N_SEM + 1)
        assert out["query_valid"].shape == (B, nq)
        assert bool(jnp.all(jnp.isfinite(out["cls_preds"])))
        if CONFIGS[name].get("iter_pred", True):
            assert len(out["aux_outputs"]) == 2

    @pytest.mark.slow
    def test_remat_matches_plain_and_grads(self):
        rng = np.random.RandomState(1)
        inp = _inputs(rng)
        plain = _mk()
        remat = _mk(use_activation_checkpoint=True)
        variables = plain.init({"params": jax.random.PRNGKey(0)}, **inp)

        def loss(m, v):
            out = m.apply(v, **inp)
            return (out["cls_preds"].sum() + out["masks"].sum()
                    + sum(a["masks"].sum() for a in out["aux_outputs"]))

        l0, g0 = jax.value_and_grad(lambda v: loss(plain, v))(variables)
        l1, g1 = jax.value_and_grad(lambda v: loss(remat, v))(variables)
        assert abs(float(l0 - l1)) < 1e-4 * max(1.0, abs(float(l0)))
        err = max(float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)))
        assert err < 1e-3, err

    def test_pe_simple_rejected(self):
        rng = np.random.RandomState(2)
        dec = _mk(iter_pred=False)
        with pytest.raises(AssertionError):
            dec.init({"params": jax.random.PRNGKey(0)}, **_inputs(rng))
