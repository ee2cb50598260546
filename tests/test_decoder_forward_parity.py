"""Bridged-weights decoder FORWARD parity against the executed reference.

The strongest checkpoint-bridge evidence available without a released
checkpoint: instantiate the actual reference ``ScanNetQueryDecoder``
(``/root/reference/segdino3d/models/decoder/instance_seg_3d_decoder.py``)
at the shipped ScanNet200 config, translate its random-initialized
``state_dict()`` through our torch bridge (``train/torch_import.py``), run
BOTH decoders on the same ragged 2-scene inputs (ours padded + masked),
and require numerically matching outputs — final and aux-layer class
logits, mask logits, centers, sizes, and semantic logits.

This executes every bridged decoder surface end-to-end: input/mask/query
projections, concat-PE cross-attention with box modulation, packed-qkv
self-attention, DINO-X query CA with the distance mask + dummy token,
FFNs, iterative heads with attn-mask gating, and the bbox/size MLPs with
detached reference updates (reference :606-799).
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

from test_torch_roundtrip import _ref_decoder
from segdino3d_tpu.train.torch_import import import_state_dict


def _pad(a, n, axis=0):
    w = [(0, 0)] * a.ndim
    w[axis] = (0, n - a.shape[axis])
    return np.pad(a, w)


@pytest.mark.slow
def test_bridged_decoder_forward_matches_reference():
    torch.manual_seed(0)
    dec = _ref_decoder().eval()
    sd = {f"decoder.{k}": v for k, v in dec.state_dict().items()}
    params, stats, unmapped = import_state_dict(sd)
    assert unmapped == []

    rng = np.random.RandomState(11)
    n_sp, n_q, n_k = [10, 7], [6, 5], [4, 3]
    S, Q, K = 12, 8, 5
    in_ch, d2d = 96, 256
    scenes = []
    for j in range(2):
        sp_f = rng.randn(n_sp[j], in_ch).astype(np.float32)
        sp_p = (rng.rand(n_sp[j], 3) * 4 - 2).astype(np.float32)
        sp_pw = sp_p + rng.randn(n_sp[j], 3).astype(np.float32) * 0.05
        q_idx = rng.choice(n_sp[j], n_q[j], replace=False)
        q_f, q_p = sp_f[q_idx], sp_p[q_idx]
        k_f = rng.randn(n_k[j], d2d).astype(np.float32)
        # put 2D queries near superpoints so the distance mask is a mix
        k_p = sp_pw[rng.choice(n_sp[j], n_k[j])] + \
            rng.randn(n_k[j], 3).astype(np.float32) * 0.15
        lo = sp_p.min(0) - 0.5
        hi = sp_p.max(0) + 0.5
        scenes.append(dict(sp_f=sp_f, sp_p=sp_p, sp_pw=sp_pw, q_f=q_f,
                           q_p=q_p, k_f=k_f, k_p=k_p, lo=lo, hi=hi))

    t = torch.as_tensor
    with torch.no_grad():
        ref = dec.forward_iter_pred(
            x=[t(s["sp_f"]) for s in scenes],
            queries=[t(s["q_f"]) for s in scenes],
            dinox_queries=[t(s["k_f"]) for s in scenes],
            x_pos=[t(s["sp_p"]) for s in scenes],
            queries_pos=[t(s["q_p"]) for s in scenes],
            dinox_query_pos=[t(s["k_p"]) for s in scenes],
            pos_wo_elastic=[t(s["sp_pw"]) for s in scenes],
            scene_range=[(t(s["lo"]), t(s["hi"])) for s in scenes])

    from segdino3d_tpu.models.decoder.query_decoder import ScanNetQueryDecoder
    ours = ScanNetQueryDecoder(
        num_layers=6, num_instance_classes=198, num_semantic_classes=200,
        in_channels=96, d_model=256, num_heads=8, hidden_dim=1024,
        dropout=0.0, activation_fn="gelu", iter_pred=True, attn_mask=True,
        fix_attention=True, objectness_flag=False, add_dinox_query_ca=True,
        add_dinox_query_ca_mask=True, add_positional_embedding=True,
        pos_type="sine", temperature=20, add_box_size_pred=True,
        box_modulate_ca=True, normalize_box_prediction=True)

    j32 = lambda a: jnp.asarray(a, jnp.float32)
    sp_feats = j32(np.stack([_pad(s["sp_f"], S) for s in scenes]))
    sp_pos = j32(np.stack([_pad(s["sp_p"], S) for s in scenes]))
    sp_pw = j32(np.stack([_pad(s["sp_pw"], S) for s in scenes]))
    q_feats = j32(np.stack([_pad(s["q_f"], Q) for s in scenes]))
    q_pos = j32(np.stack([_pad(s["q_p"], Q) for s in scenes]))
    k_feats = j32(np.stack([_pad(s["k_f"], K) for s in scenes]))
    k_pos = j32(np.stack([_pad(s["k_p"], K) for s in scenes]))
    valid = lambda ns, cap: jnp.asarray(
        np.stack([np.arange(cap) < n for n in ns]))
    srange = j32(np.stack([np.stack([s["lo"], s["hi"]]) for s in scenes]))

    out = ours.apply({"params": params["decoder"]},
                     sp_feats, valid(n_sp, S), sp_pos, sp_pw,
                     q_feats, valid(n_q, Q), q_pos,
                     k_feats, k_pos, valid(n_k, K), srange)

    def close(a, b, what, rtol=2e-4, atol=2e-4):
        np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                   rtol=rtol, atol=atol, err_msg=what)

    for j in range(2):
        nq, ns = n_q[j], n_sp[j]
        close(out["cls_preds"][j, :nq], ref["cls_preds"][j], f"cls[{j}]")
        close(out["sem_preds"][j, :nq], ref["sem_preds"][j], f"sem[{j}]")
        close(out["masks"][j, :nq, :ns], ref["masks"][j], f"masks[{j}]",
              atol=5e-4)
        close(out["centers"][j, :nq], ref["centers"][j], f"centers[{j}]")
        close(out["sizes"][j, :nq], ref["sizes"][j], f"sizes[{j}]")
        # aux layers: first (pre-decoder head) and a middle one
        for li in (0, 3):
            close(out["aux_outputs"][li]["cls_preds"][j, :nq],
                  ref["aux_outputs"][li]["cls_preds"][j], f"aux{li}.cls[{j}]")
            close(out["aux_outputs"][li]["masks"][j, :nq, :ns],
                  ref["aux_outputs"][li]["masks"][j], f"aux{li}.masks[{j}]",
                  atol=5e-4)
            if ref["aux_outputs"][li]["centers"][j] is not None:
                close(out["aux_outputs"][li]["centers"][j, :nq],
                      ref["aux_outputs"][li]["centers"][j],
                      f"aux{li}.centers[{j}]")
