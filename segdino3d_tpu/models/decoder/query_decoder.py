"""ScanNet query decoder (DAB-DETR style) over padded dense batches.

TPU-native re-design of ``ScanNetQueryDecoder``
(``/root/reference/segdino3d/models/decoder/instance_seg_3d_decoder.py:
437-799``).  The reference iterates python lists of ragged per-scene
tensors; here every step is a batched einsum over (B, Q, S) padded tensors
with validity masks, so the 6-layer stack jits into one fused XLA program.

Feature parity checklist (file:line references into the reference):
* iterative heads with mask-attention gating ``sigmoid(mask) < thr`` and
  all-blocked-row reset (:568-573);
* 3D positional pipeline: sine PE over scene range (temp=20),
  ``ref_point_head`` MLP, decomposed content/position projections with
  concat-PE cross-attention (q,k are 2*d_model, v is d_model) (:471-515,
  :658-691);
* box-modulated PE via ``ref_anchor_head`` (:525-529, :659-663);
* per-layer center offsets and size predictions with detached reference
  updates, sizes in inverse-sigmoid normalized scene-range space
  (:734-759, :768-772);
* DINO-X object-query cross-attention per layer with L1-distance-gated
  mask composed with the current mask-attention, plus an always-attendable
  all-ones dummy token (:713-731);
* PE-aware self-attention among queries (:695-709);
* semantic head on the last layer only (:563);
* aux outputs per layer for deep supervision (:773-783).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from segdino3d_tpu.models.layers import MLP
from segdino3d_tpu.ops.attention import multi_head_attention
from segdino3d_tpu.ops.pos_embed import fourier_pos_embed, sine_pos_embed
from segdino3d_tpu.registry import DECODERS


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


class FFN(nn.Module):
    """Feed-forward block (reference :153-190).

    ``dtype`` sets the matmul compute dtype (params stay f32); the
    closing LayerNorm promotes back to f32 at the residual boundary,
    so a bf16 FFN never degrades the residual stream itself."""
    d_model: int
    hidden_dim: int
    dropout: float
    activation_fn: str = "gelu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        act = nn.relu if self.activation_fn == "relu" else nn.gelu
        h = nn.Dense(self.hidden_dim, name="lin1", dtype=self.dtype)(x)
        h = act(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, name="lin2", dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(name="norm")(x + h)


class StandardCrossAttention(nn.Module):
    """nn.MultiheadAttention-equivalent CA + residual + norm ("fix" variant,
    reference CrossAttentionLayer :36-114): full q/k/v in-projections.
    ``dtype`` as in ``FFN`` (attention softmax is always f32)."""
    d_model: int
    num_heads: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, sources, queries, blocked=None, deterministic=True):
        q = nn.Dense(self.d_model, name="q_proj", dtype=self.dtype)(queries)
        k = nn.Dense(self.d_model, name="k_proj", dtype=self.dtype)(sources)
        v = nn.Dense(self.d_model, name="v_proj", dtype=self.dtype)(sources)
        out = multi_head_attention(q, k, v, self.num_heads, blocked)
        out = nn.Dense(self.d_model, name="out_proj", dtype=self.dtype)(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return nn.LayerNorm(name="norm")(queries + out)


@DECODERS.register_module()
class ScanNetQueryDecoder(nn.Module):
    """See module docstring. Config mirrors the reference decoder_cfg
    (``configs/models/base_3d.py:15-36`` + prototype overrides)."""
    num_layers: int = 6
    num_instance_classes: int = 198
    num_semantic_classes: int = 200
    num_instance_queries: int = 0
    num_semantic_queries: int = 0
    num_semantic_linears: int = 1
    in_channels: int = 96
    d_model: int = 256
    num_heads: int = 8
    hidden_dim: int = 1024
    dropout: float = 0.0
    activation_fn: str = "gelu"
    iter_pred: bool = True
    attn_mask: bool = True
    fix_attention: bool = True
    objectness_flag: bool = False
    # SegDINO3D specifics
    add_dinox_query_ca: bool = True
    add_dinox_query_ca_mask: bool = True
    dinox_query_ca_mask_threshold: float = 0.2
    mask_attention_threshold: float = 0.5
    add_positional_embedding: bool = True
    pos_type: str = "sine"
    temperature: float = 20.0
    gauss_scale: float = 1.0
    add_box_size_pred: bool = True
    box_modulate_ca: bool = True
    normalize_box_prediction: bool = True
    use_activation_checkpoint: bool = False
    # matmul compute dtype for the attention/FFN projections ("bfloat16"
    # halves their HBM traffic and doubles MXU rate). Numerics guardrails
    # regardless of this setting: params stay f32, every LayerNorm
    # (block boundary) and attention softmax computes f32, and the
    # prediction heads + mask logits (out_*, x_mask*, bbox/ref MLPs, PE)
    # are exempt — they stay f32 because thresholds read their outputs.
    compute_dtype: str = "float32"

    def _head(self, queries, mask_feats, sp_valid, query_valid, last_flag):
        """Iterative prediction head (reference :532-577)."""
        nq = queries
        norm_q = self.out_norm(nq)
        cls_pred = self.out_cls(norm_q)
        sem_pred = self.out_sem(norm_q) if last_flag else None
        score = self.out_score(norm_q) if self.objectness_flag else None
        pred_mask = jnp.einsum("bqd,bsd->bqs", norm_q, mask_feats)
        attn_blocked = None
        if self.attn_mask:
            blocked = nn.sigmoid(pred_mask) < self.mask_attention_threshold
            blocked = blocked | ~sp_valid[:, None, :]
            # rows where every *valid* superpoint is blocked -> unblock all
            n_valid = jnp.sum(sp_valid, axis=-1)[:, None]
            n_blocked_valid = jnp.sum(blocked & sp_valid[:, None, :], axis=-1)
            all_blocked = n_blocked_valid >= n_valid
            blocked = jnp.where(all_blocked[..., None], False, blocked)
            blocked = blocked | ~sp_valid[:, None, :]
            attn_blocked = lax.stop_gradient(blocked)
        return cls_pred, sem_pred, score, pred_mask, attn_blocked

    def setup(self):
        D = self.d_model
        dt = (None if self.compute_dtype == "float32"
              else jnp.dtype(self.compute_dtype))
        # activation checkpointing (reference `_checkpoint_forward`,
        # instance_seg_3d_decoder.py:270-284): remat the per-layer blocks
        # so the backward pass recomputes attention/FFN activations
        remat_ffn = (nn.remat(FFN, static_argnums=(2,))
                     if self.use_activation_checkpoint else FFN)
        remat_xattn = (nn.remat(StandardCrossAttention, static_argnums=(4,))
                       if self.use_activation_checkpoint
                       else StandardCrossAttention)
        self.input_proj_dense = nn.Dense(D, name="input_proj_dense", dtype=dt)
        self.input_proj_norm = nn.LayerNorm(name="input_proj_norm")
        if self.num_instance_queries + self.num_semantic_queries > 0:
            self.query_embed = nn.Embed(
                self.num_instance_queries + self.num_semantic_queries, D,
                name="query_embed")
        if self.num_instance_queries == 0:
            self.query_proj1 = nn.Dense(D, name="query_proj1")
            self.query_proj2 = nn.Dense(D, name="query_proj2")
        self.x_mask1 = nn.Dense(D, name="x_mask1")
        self.x_mask2 = nn.Dense(D, name="x_mask2")
        self.out_norm = nn.LayerNorm(name="out_norm")
        self.out_cls = nn.Sequential([
            nn.Dense(D), nn.relu, nn.Dense(self.num_instance_classes + 1)])
        if self.num_semantic_linears == 2:
            self.out_sem = nn.Sequential([
                nn.Dense(D), nn.relu, nn.Dense(self.num_semantic_classes + 1)])
        else:
            self.out_sem = nn.Dense(self.num_semantic_classes + 1, name="out_sem")
        if self.objectness_flag:
            self.out_score = nn.Sequential([nn.Dense(D), nn.relu, nn.Dense(1)])

        L = self.num_layers
        self.ffns = [remat_ffn(D, self.hidden_dim, self.dropout,
                               self.activation_fn, dt, name=f"ffn_{i}")
                     for i in range(L)]

        if self.add_positional_embedding:
            if self.pos_type == "fourier":
                # fixed Gaussian projection matrix (reference registers a
                # non-trainable buffer, utils.py:49-51)
                self.gauss_b = self.param(
                    "gauss_B",
                    lambda key, shape: self.gauss_scale
                    * jax.random.normal(key, shape), (3, D // 2))
            self.ref_point_head = MLP(D, D, 2, name="ref_point_head")
            self.bbox_embed = [MLP(D, 3, 3, last_zero_init=True,
                                   name=f"bbox_embed_{i}") for i in range(L)]
            if self.add_box_size_pred:
                self.bbox_size_embed = [MLP(D, 3, 3, last_zero_init=True,
                                            name=f"bbox_size_embed_{i}")
                                        for i in range(L)]
            if self.box_modulate_ca:
                self.ref_anchor_head = MLP(D, 3, 2, name="ref_anchor_head")
            # cross-attention projections (reference :483-499)
            self.ca_qpos_proj = nn.Dense(D, name="ca_qpos_proj", dtype=dt)  # layer-0 only
            self.ca_qcontent_proj = [nn.Dense(D, name=f"ca_qcontent_proj_{i}", dtype=dt) for i in range(L)]
            self.ca_kcontent_proj = [nn.Dense(D, name=f"ca_kcontent_proj_{i}", dtype=dt) for i in range(L)]
            self.ca_kpos_proj = [nn.Dense(D, name=f"ca_kpos_proj_{i}", dtype=dt) for i in range(L)]
            self.ca_v_proj = [nn.Dense(D, name=f"ca_v_proj_{i}", dtype=dt) for i in range(L)]
            self.ca_qpos_sine_proj = [nn.Dense(D, name=f"ca_qpos_sine_proj_{i}", dtype=dt) for i in range(L)]
            self.ca_out_proj = [nn.Dense(D, name=f"ca_out_proj_{i}", dtype=dt) for i in range(L)]
            self.ca_norm = [nn.LayerNorm(name=f"ca_norm_{i}") for i in range(L)]
            # self-attention projections (reference :501-515)
            self.sa_qcontent_proj = [nn.Dense(D, name=f"sa_qcontent_proj_{i}", dtype=dt) for i in range(L)]
            self.sa_qpos_proj = [nn.Dense(D, name=f"sa_qpos_proj_{i}", dtype=dt) for i in range(L)]
            self.sa_kcontent_proj = [nn.Dense(D, name=f"sa_kcontent_proj_{i}", dtype=dt) for i in range(L)]
            self.sa_kpos_proj = [nn.Dense(D, name=f"sa_kpos_proj_{i}", dtype=dt) for i in range(L)]
            self.sa_v_proj = [nn.Dense(D, name=f"sa_v_proj_{i}", dtype=dt) for i in range(L)]
            self.sa_out_proj = [nn.Dense(D, name=f"sa_out_proj_{i}", dtype=dt) for i in range(L)]
            self.sa_norm = [nn.LayerNorm(name=f"sa_norm_{i}") for i in range(L)]
        else:
            self.plain_ca = [remat_xattn(
                D, self.num_heads, self.dropout, dt, name=f"plain_ca_{i}")
                for i in range(L)]
            self.plain_sa = [remat_xattn(
                D, self.num_heads, self.dropout, dt, name=f"plain_sa_{i}")
                for i in range(L)]

        if self.add_dinox_query_ca:
            self.dinox_ca = [remat_xattn(
                D, self.num_heads, self.dropout, dt, name=f"dinox_ca_{i}")
                for i in range(L)]

    def score_superpoints(self, sp_feats):
        """Per-superpoint max class probability, used by the architecture's
        ``query_num`` top-k query selection (reference
        ``baseline3d.py:231-243``)."""
        q = self.query_proj2(nn.relu(self.query_proj1(sp_feats)))
        cls = self.out_cls(self.out_norm(q))
        return jax.nn.softmax(cls, axis=-1)[..., :-1].max(-1)

    def _pe(self, pos, scene_range, modulated=None):
        rng = (scene_range[:, 0], scene_range[:, 1])
        if self.pos_type == "fourier":
            gb = lax.stop_gradient(self.gauss_b)
            return fourier_pos_embed(pos, gb, self.d_model, rng,
                                     modulated=modulated)
        return sine_pos_embed(pos, self.d_model, rng,
                              temperature=self.temperature,
                              modulated=modulated)

    def _interleave_heads(self, content, pos_emb):
        """Concat per-head [content_head ; pos_head] -> (..., 2*D), matching
        the reference's view/cat packing (:679-687)."""
        b, n, d = content.shape
        h = self.num_heads
        hd = d // h
        c = content.reshape(b, n, h, hd)
        p = pos_emb.reshape(b, n, h, hd)
        return jnp.concatenate([c, p], axis=-1).reshape(b, n, 2 * d)

    def __call__(
        self,
        sp_feats: jnp.ndarray,           # (B, S, in_channels)
        sp_valid: jnp.ndarray,           # (B, S) bool
        sp_pos: Optional[jnp.ndarray],   # (B, S, 3)
        sp_pos_wo_elastic: Optional[jnp.ndarray],
        queries_feat: jnp.ndarray,       # (B, Q, in_channels)
        query_valid: jnp.ndarray,        # (B, Q) bool
        queries_pos: Optional[jnp.ndarray],   # (B, Q, 3)
        dinox_queries: Optional[jnp.ndarray] = None,   # (B, K, d_model)
        dinox_query_pos: Optional[jnp.ndarray] = None, # (B, K, 3)
        dinox_valid: Optional[jnp.ndarray] = None,     # (B, K)
        scene_range: Optional[jnp.ndarray] = None,     # (B, 2, 3)
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        D = self.d_model
        B, S = sp_feats.shape[:2]
        Q = queries_feat.shape[1]

        inst_feats = nn.relu(self.input_proj_norm(self.input_proj_dense(sp_feats)))
        mask_feats = self.x_mask2(nn.relu(self.x_mask1(sp_feats)))
        mask_feats = jnp.where(sp_valid[..., None], mask_feats, 0.0)

        # queries: learned embeddings first, then projected superpoint
        # queries (reference ``_get_queries`` concat order, :286-309)
        nq_learned = self.num_instance_queries + self.num_semantic_queries
        parts = []
        if nq_learned > 0:
            assert not self.add_positional_embedding, (
                "learned queries carry no 3D reference point; the reference "
                "only combines num_instance_queries>0 with the plain "
                "(non-PE) decoder")
            parts.append(jnp.broadcast_to(
                self.query_embed.embedding[None].astype(queries_feat.dtype),
                (B, nq_learned, D)))
        if self.num_instance_queries == 0:
            parts.append(self.query_proj2(nn.relu(
                self.query_proj1(queries_feat))))
        queries = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        if nq_learned > 0:
            query_valid = jnp.concatenate(
                [jnp.ones((B, nq_learned), bool), query_valid]
                if self.num_instance_queries == 0
                else [jnp.ones((B, nq_learned), bool)], axis=1)
            Q = queries.shape[1]

        if not self.iter_pred:
            # simple non-iterative path (reference forward_simple :579-604):
            # unmasked CA/SA/FFN stack, single head at the end.
            # NOTE iter_pred=False with positional embeddings is broken in
            # the reference itself — with PE on its cross_attn_layers are
            # raw 2*d_model MultiheadAttention modules (:241-242) that
            # forward_simple calls with d_model inputs (:595); we mirror
            # the de-facto capability surface (plain decoder only).
            assert not self.add_positional_embedding, \
                "iter_pred=False implemented for the plain (non-PE) decoder"
            key_block_sp = ~sp_valid[:, None, :]
            key_block_q = ~query_valid[:, None, :]
            for i in range(self.num_layers):
                queries = self.plain_ca[i](inst_feats, queries,
                                           key_block_sp, deterministic)
                queries = self.plain_sa[i](queries, queries,
                                           key_block_q, deterministic)
                queries = self.ffns[i](queries, deterministic)
            cls_p, sem_p, score_p, mask_p, _ = self._head(
                queries, mask_feats, sp_valid, query_valid, last_flag=True)
            return dict(cls_preds=cls_p, sem_preds=sem_p, masks=mask_p,
                        scores=score_p, centers=None, sizes=None,
                        aux_outputs=[], hidden_states=queries,
                        query_valid=query_valid)

        mha = (jax.checkpoint(multi_head_attention, static_argnums=(3, 5))
               if self.use_activation_checkpoint else multi_head_attention)
        if self.add_positional_embedding:
            reference_points = queries_pos                       # (B, Q, 3)
            memory_emb = self._pe(sp_pos, scene_range)           # (B, S, D)
            extent = scene_range[:, 1] - scene_range[:, 0]       # (B, 3)
            if self.normalize_box_prediction:
                ref_sizes = jnp.broadcast_to(
                    (0.5 / jnp.maximum(extent, 1e-12))[:, None, :], (B, Q, 3))
            else:
                ref_sizes = jnp.full((B, Q, 3), 0.5)

        layers_cls, layers_sem, layers_score = [], [], []
        layers_mask, layers_center, layers_size = [], [], []

        cls_p, sem_p, score_p, mask_p, attn_blocked = self._head(
            queries, mask_feats, sp_valid, query_valid, last_flag=False)
        layers_cls.append(cls_p)
        layers_sem.append(sem_p)
        layers_score.append(score_p)
        layers_mask.append(mask_p)
        layers_center.append(None)
        layers_size.append(None)

        if self.add_dinox_query_ca and dinox_queries is not None:
            # static append of the all-ones fallback token (reference :725)
            ones_tok = jnp.ones((B, 1, dinox_queries.shape[-1]),
                                dinox_queries.dtype)
            dinox_tokens = jnp.concatenate([dinox_queries, ones_tok], axis=1)

        for i in range(self.num_layers):
            # ---------------- cross attention ----------------
            if self.add_positional_embedding:
                if self.box_modulate_ca:
                    ref_hwl = nn.sigmoid(self.ref_anchor_head(queries))
                    mod = ref_hwl / jnp.maximum(ref_sizes, 1e-12)
                    pos_q_emb = self._pe(reference_points, scene_range, modulated=mod)
                else:
                    pos_q_emb = self._pe(reference_points, scene_range)
                query_pos = self.ref_point_head(pos_q_emb)       # (B, Q, D)

                q_content = self.ca_qcontent_proj[i](queries)
                k_content = self.ca_kcontent_proj[i](inst_feats)
                v = self.ca_v_proj[i](inst_feats)
                k_pos = self.ca_kpos_proj[i](memory_emb)
                if i == 0:
                    q = q_content + self.ca_qpos_proj(query_pos)
                    k = k_content + k_pos
                else:
                    q = q_content
                    k = k_content
                q_sine = self.ca_qpos_sine_proj[i](pos_q_emb)
                q2 = self._interleave_heads(q, q_sine)           # (B, Q, 2D)
                k2 = self._interleave_heads(k, k_pos)            # (B, S, 2D)
                # reference scales by (2D/heads)^-0.5 (embed dim of the
                # concat-PE attention)
                scale = float(2 * D // self.num_heads) ** -0.5
                ca_out = mha(q2, k2, v, self.num_heads, attn_blocked, scale)
                ca_out = self.ca_out_proj[i](ca_out)
                queries = self.ca_norm[i](queries + ca_out)
            else:
                queries = self.plain_ca[i](
                    inst_feats, queries, attn_blocked, deterministic)

            # ---------------- self attention ----------------
            key_block = ~query_valid[:, None, :]                  # (B, 1, Q)
            if self.add_positional_embedding:
                qc = self.sa_qcontent_proj[i](queries)
                qp = self.sa_qpos_proj[i](query_pos)
                kc = self.sa_kcontent_proj[i](queries)
                kp = self.sa_kpos_proj[i](query_pos)
                vv = self.sa_v_proj[i](queries)
                sa_out = mha(qc + qp, kc + kp, vv, self.num_heads,
                             key_block, None)
                sa_out = self.sa_out_proj[i](sa_out)
                queries = self.sa_norm[i](queries + sa_out)
            else:
                queries = self.plain_sa[i](
                    queries, queries, key_block, deterministic)

            # ---------------- DINO-X object-query cross attention ----------
            if self.add_dinox_query_ca and dinox_queries is not None:
                if self.add_dinox_query_ca_mask:
                    dist = jnp.sum(
                        jnp.abs(sp_pos_wo_elastic[:, :, None, :]
                                - dinox_query_pos[:, None, :, :]), axis=-1)
                    near = (dist < self.dinox_query_ca_mask_threshold)
                    near = near & dinox_valid[:, None, :] & sp_valid[:, :, None]
                    reach = jnp.einsum(
                        "bqs,bsk->bqk",
                        (~attn_blocked).astype(jnp.float32),
                        near.astype(jnp.float32))
                    blocked_2d = reach == 0                       # (B, Q, K)
                    blocked_2d = jnp.concatenate(
                        [blocked_2d, jnp.zeros((B, Q, 1), bool)], axis=-1)
                    queries = self.dinox_ca[i](
                        dinox_tokens, queries, blocked_2d, deterministic)
                else:
                    kb = (~jnp.concatenate(
                        [dinox_valid, jnp.ones((B, 1), bool)], 1))[:, None, :]
                    queries = self.dinox_ca[i](
                        dinox_tokens, queries, kb, deterministic)

            # ---------------- FFN ----------------
            queries = self.ffns[i](queries, deterministic)

            # ---------------- positional query update ----------------
            if self.add_positional_embedding:
                pred_center = reference_points + self.bbox_embed[i](queries)
                layers_center.append(pred_center)
                reference_points = lax.stop_gradient(pred_center)
                if self.add_box_size_pred:
                    if self.normalize_box_prediction:
                        pred_size = nn.sigmoid(
                            inverse_sigmoid(ref_sizes)
                            + self.bbox_size_embed[i](queries))
                    else:
                        pred_size = ref_sizes + self.bbox_size_embed[i](queries)
                    layers_size.append(pred_size)
                    ref_sizes = lax.stop_gradient(pred_size)
                else:
                    layers_size.append(None)
            else:
                layers_center.append(None)
                layers_size.append(None)

            last = i == self.num_layers - 1
            cls_p, sem_p, score_p, mask_p, attn_blocked = self._head(
                queries, mask_feats, sp_valid, query_valid, last_flag=last)
            layers_cls.append(cls_p)
            layers_sem.append(sem_p)
            layers_score.append(score_p)
            layers_mask.append(mask_p)

        if self.normalize_box_prediction:
            extent = scene_range[:, 1] - scene_range[:, 0]
            layers_size = [
                None if s is None else s * extent[:, None, :]
                for s in layers_size]

        aux_outputs = [
            dict(cls_preds=c, sem_preds=sm, masks=m, scores=sc,
                 centers=ce, sizes=sz)
            for c, sm, sc, m, ce, sz in zip(
                layers_cls[:-1], layers_sem[:-1], layers_score[:-1],
                layers_mask[:-1], layers_center[:-1], layers_size[:-1])]

        return dict(
            cls_preds=layers_cls[-1],
            sem_preds=layers_sem[-1],
            masks=layers_mask[-1],
            scores=layers_score[-1],
            centers=layers_center[-1],
            sizes=layers_size[-1],
            aux_outputs=aux_outputs,
            hidden_states=queries,
            query_valid=query_valid,
        )
