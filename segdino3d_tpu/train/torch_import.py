"""Torch ``.pth`` checkpoint -> JAX pytree converter.

Capability parity with the reference's checkpoint loading
(``/root/reference/utils/ckpt_utils.py:10-113``): released SegDINO3D
checkpoints and pretrained backbones (Mask3D/SSTNet inits) import into the
TPU model.  The source naming was harvested by instantiating the actual
reference modules (``tests/reference_import.py``) and reading
``state_dict()`` keys; the Res16UNet/SpConvUNet names come from the module
attribute assignments in ``/root/reference/segdino3d/models/backbone/
minkunet.py:365-529`` and ``spconvunet.py:21-226``.

Handled translations:

* ``module.`` prefix stripping (``clean_state_dict``);
* torch Linear ``(out, in)`` -> flax Dense ``(in, out)`` transposes,
  LayerNorm/BatchNorm ``weight`` -> ``scale``;
* MinkowskiConvolution kernels ``(kernel_volume, Cin, Cout)`` with a
  configurable kernel-offset permutation (``kernel_order``); the derived
  default is ``x_slowest`` = identity — see ``kernel_permutation`` for the
  derivation from the pinned ME build's public source, and
  ``scripts/parity_eval.sh`` for the real-checkpoint auto-disambiguation
  that empirically confirms/refutes it in one run;
* spconv ``SubMConv3d/SparseConv3d/SparseInverseConv3d`` 5-d kernels in
  either v2.x layout — KRSC ``(Cout, k, k, k, Cin)`` or RSCK
  ``(k, k, k, Cin, Cout)`` — sniffed by shape.  spconv's kernel-volume
  enumeration decomposes the linear index last-dimension-fastest
  (``include/spconv/geometry.h``, ``getValidOutPos``: ``for (j = NDim-1;
  j >= 0; --j) { pos[j] = val % kernelSize[j]; val /= kernelSize[j]; }``),
  i.e. plain row-major — so the plain ``reshape(k**3, Cin, Cout)`` in
  ``_spconv_kernel`` is already offset-exact, no permutation knob needed.
  ``SparseInverseConv3d`` (``src/spconv/spconv_ops.cc``, ``indiceConv``
  with ``inverse=true``) reuses the forward pair tables with the gather/
  scatter roles swapped (``indicePairs[i][inverse ? 1 : 0]``) and the
  filter indexed by the SAME slot ``i`` — no kernel flip — matching our
  ``up_conv`` exact-transpose (``ops/sparse_conv.py``), which also keeps
  slot ``o`` = the fine voxel's offset within its parent's 2x2x2 block;
* torch ``nn.MultiheadAttention`` packed ``in_proj_weight`` (3D, D) ->
  split q/k/v Dense kernels (the decoder's DINO-X cross-attention);
* BN running stats -> the ``batch_stats`` collection (same pass).

``import_checkpoint`` returns ``(params, batch_stats, unmapped)``.
"""
from __future__ import annotations

import itertools
import re
from typing import Dict, List, Optional, Tuple

import numpy as np


def kernel_permutation(k: int, order: str) -> np.ndarray:
    """Permutation from the ME kernel-offset order to ours (x slowest).

    Derivation of the default (``x_slowest`` = identity).  The reference
    pins a source build of MinkowskiEngine master/v0.5.4
    (``/root/reference/installation.md:13-35``).  In that source, kernel
    maps enumerate the kernel region through
    ``kernel_region_iterator::operator++`` (``src/kernel_region.hpp``),
    which is an odometer over the coordinate vector ``(batch, x, y, z)``
    incrementing from the LAST index down::

        for (index_type i = m_coordinate_size - 1; i > 0; --i) {
          m_coordinate[i] += dilation; if (within upper) return *this;
          m_coordinate[i] = lower;     // carry into the next-slower axis
        }

    so the kernel-volume index is row-major over ``(x, y, z)`` with z
    fastest — exactly ``itertools.product(range(k), repeat=3)``, our
    canonical order (``ops/sparse_conv.py:kernel_offsets``).  The GPU path
    (``coordinate_at`` in ``kernel_region.hpp``) decomposes the linear
    index with the same convention, and ME's dense()/Conv3d equivalence
    (kernels compared via a direct ``reshape(k,k,k,Cin,Cout)``) confirms
    row-major.  Offsets per axis: centered ``-(k-1)/2..(k-1)/2`` for odd
    k, corner-anchored ``0..k-1`` for even k — same as ``kernel_offsets``.

    ``x_fastest`` (the transposed enumeration) is kept so
    ``scripts/parity_eval.sh`` can empirically disambiguate on a real
    checkpoint in a single run: a wrong order scrambles the backbone's
    spatial kernels and collapses val mAP, so comparing a small-val-split
    eval under both orders is decisive.
    """
    if order == "x_slowest":
        return np.arange(k ** 3)
    offs_ours = list(itertools.product(range(k), range(k), range(k)))
    # x fastest: index = x + k*y + k*k*z  -> position of (x,y,z) in ME order
    perm = np.zeros(k ** 3, np.int64)
    for ours_idx, (x, y, z) in enumerate(offs_ours):
        me_idx = x + k * y + k * k * z
        perm[ours_idx] = me_idx
    return perm


def clean_state_dict(sd: Dict) -> Dict:
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def _set(tree: Dict, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _me_kernel(arr: np.ndarray, order: str) -> np.ndarray:
    """(kernel_volume, Cin, Cout) ME kernel -> canonical offset order."""
    vol = arr.shape[0]
    k = round(vol ** (1 / 3))
    if k ** 3 == vol and vol > 1:
        return arr[kernel_permutation(k, order)]
    return arr


def _spconv_kernel(arr: np.ndarray) -> np.ndarray:
    """spconv 5-d kernel -> (k^3, Cin, Cout), canonical (x slowest) order.

    spconv v2 uses KRSC ``(Cout, kx, ky, kz, Cin)`` for the implicit-gemm
    algos and RSCK ``(kx, ky, kz, Cin, Cout)`` for Native; we sniff by which
    end holds the spatial dims (all equal and small).
    """
    if arr.ndim != 5:
        return arr
    if arr.shape[1] == arr.shape[2] == arr.shape[3]:      # KRSC
        k = arr.shape[1]
        arr = np.moveaxis(arr, 0, -1)                      # (k,k,k,Cin,Cout)
    else:                                                  # RSCK
        k = arr.shape[0]
    return arr.reshape(k ** 3, arr.shape[-2], arr.shape[-1])


_LN = {"weight": "scale", "bias": "bias"}
_BNS = {"running_mean": "mean", "running_var": "var"}


def _translate(k: str, arr: np.ndarray, kernel_order: str
               ) -> Optional[List[Tuple[str, str, np.ndarray]]]:
    """One torch key -> [(collection, flax_path, array), ...] or None."""
    out_t = lambda p: [("params", p, arr.T)]
    raw = lambda p: [("params", p, arr)]

    # ======================= Res16UNet backbone ==========================
    # (minkunet.py:365-529; ME conv param ".kernel", MinkowskiBatchNorm
    #  wraps an nn.BatchNorm1d under ".bn")
    m = re.match(r"backbone\.(conv0p1s1|conv\dp\d+s2|convtr\dp\d+s2)\.kernel$", k)
    if m:
        return [("params", f"backbone/unet/{m.group(1)}/kernel",
                 _me_kernel(arr, kernel_order))]
    m = re.match(r"backbone\.(bn\d|bntr\d)\.bn\.(\w+)$", k)
    if m:
        if m.group(2) in _LN:
            return raw(f"backbone/unet/{m.group(1)}/{_LN[m.group(2)]}")
        if m.group(2) in _BNS:
            return [("batch_stats",
                     f"backbone/unet/{m.group(1)}/{_BNS[m.group(2)]}", arr)]
        return []   # num_batches_tracked
    m = re.match(r"backbone\.block(\d)\.(\d)\.conv(\d)\.kernel$", k)
    if m:
        return [("params",
                 f"backbone/unet/block{m.group(1)}_{m.group(2)}/"
                 f"conv{m.group(3)}/kernel", _me_kernel(arr, kernel_order))]
    m = re.match(r"backbone\.block(\d)\.(\d)\.norm(\d)\.bn\.(\w+)$", k)
    if m:
        base = (f"backbone/unet/block{m.group(1)}_{m.group(2)}/"
                f"norm{m.group(3)}")
        if m.group(4) in _LN:
            return raw(f"{base}/{_LN[m.group(4)]}")
        if m.group(4) in _BNS:
            return [("batch_stats", f"{base}/{_BNS[m.group(4)]}", arr)]
        return []
    m = re.match(r"backbone\.block(\d)\.(\d)\.downsample\.0\.kernel$", k)
    if m:
        # 1x1 ME conv kernel (1, Cin, Cout) or (Cin, Cout) -> Dense
        a = arr[0] if arr.ndim == 3 else arr
        return [("params",
                 f"backbone/unet/block{m.group(1)}_{m.group(2)}/"
                 f"downsample_conv/kernel", a)]
    m = re.match(r"backbone\.block(\d)\.(\d)\.downsample\.1\.bn\.(\w+)$", k)
    if m:
        base = (f"backbone/unet/block{m.group(1)}_{m.group(2)}/"
                f"downsample_norm")
        if m.group(3) in _LN:
            return raw(f"{base}/{_LN[m.group(3)]}")
        if m.group(3) in _BNS:
            return [("batch_stats", f"{base}/{_BNS[m.group(3)]}", arr)]
        return []

    # ========================= SpConvUNet backbone =======================
    # Recursive "u."*level nesting flattened to our per-level names
    # (spconvunet.py:100-226).
    m = re.match(r"backbone\.((?:u\.)*)(blocks|blocks_tail)\.block(\d)\."
                 r"(conv_branch|i_branch)\.(\d)\.(\w+)$", k)
    if m:
        lvl = m.group(1).count("u.")
        stage = "blocks" if m.group(2) == "blocks" else "tail"
        base = f"backbone/unet/{stage}_l{lvl}_{m.group(3)}"
        branch, idx, leaf = m.group(4), int(m.group(5)), m.group(6)
        if branch == "i_branch":
            if leaf == "weight":
                # k=1 SubMConv3d -> our Dense identity branch
                a = _spconv_kernel(arr)[0] if arr.ndim == 5 else arr.T
                return [("params", f"{base}/i_branch/kernel", a)]
            return []
        # conv_branch (normalize_before): 0=BN,1=ReLU,2=conv1,3=BN,4=ReLU,5=conv2
        names = {0: ("norm1", "bn"), 2: ("conv1", "conv"),
                 3: ("norm2", "bn"), 5: ("conv2", "conv")}
        if idx not in names:
            return []
        name, kind = names[idx]
        if kind == "conv":
            return [("params", f"{base}/{name}/kernel", _spconv_kernel(arr))]
        if leaf in _LN:
            return raw(f"{base}/{name}/{_LN[leaf]}")
        if leaf in _BNS:
            return [("batch_stats", f"{base}/{name}/{_BNS[leaf]}", arr)]
        return []
    m = re.match(r"backbone\.((?:u\.)*)(conv|deconv)\.(\d)\.(\w+)$", k)
    if m:
        lvl = m.group(1).count("u.")
        up = m.group(2) == "deconv"
        idx, leaf = int(m.group(3)), m.group(4)
        if idx == 2 and leaf == "weight":   # the strided/inverse conv
            name = f"up_conv_{lvl}" if up else f"down_conv_{lvl}"
            return [("params", f"backbone/unet/{name}/kernel",
                     _spconv_kernel(arr))]
        if idx == 0:                        # pre-norm BN
            name = f"up_norm_{lvl}" if up else f"down_norm_{lvl}"
            if leaf in _LN:
                return raw(f"backbone/unet/{name}/{_LN[leaf]}")
            if leaf in _BNS:
                return [("batch_stats",
                         f"backbone/unet/{name}/{_BNS[leaf]}", arr)]
        return []
    m = re.match(r"backbone\.input_conv\.0\.weight$", k)
    if m:
        return [("params", "backbone/unet/input_conv/kernel",
                 _spconv_kernel(arr))]
    m = re.match(r"backbone\.output_layer\.0\.(\w+)$", k)
    if m:
        leaf = m.group(1)
        if leaf in _LN:
            return raw(f"backbone/unet/output_norm/{_LN[leaf]}")
        if leaf in _BNS:
            return [("batch_stats",
                     f"backbone/unet/output_norm/{_BNS[leaf]}", arr)]
        return []

    # ============================ decoder ================================
    # (instance_seg_3d_decoder.py:437-530; naming harvested from the real
    #  module's state_dict via tests/reference_import.py)
    m = re.match(r"decoder\.input_proj\.(0|1)\.(weight|bias)$", k)
    if m:
        if m.group(1) == "0":
            return (out_t("decoder/input_proj_dense/kernel")
                    if m.group(2) == "weight"
                    else raw("decoder/input_proj_dense/bias"))
        return raw(f"decoder/input_proj_norm/{_LN[m.group(2)]}")
    m = re.match(r"decoder\.(x_mask|query_proj)\.(0|2)\.(weight|bias)$", k)
    if m:
        ours = {"x_mask": "x_mask", "query_proj": "query_proj"}[m.group(1)]
        idx = "1" if m.group(2) == "0" else "2"
        p = f"decoder/{ours}{idx}"
        return out_t(f"{p}/kernel") if m.group(3) == "weight" \
            else raw(f"{p}/bias")
    m = re.match(r"decoder\.out_norm\.(weight|bias)$", k)
    if m:
        return raw(f"decoder/out_norm/{_LN[m.group(1)]}")
    m = re.match(r"decoder\.(out_cls|out_sem|out_score)\.(0|2)\.(weight|bias)$", k)
    if m:
        # torch Sequential(Linear, ReLU, Linear) -> flax Sequential names
        # its module list entries layers_0 / layers_2 (relu keeps an index)
        sub = f"layers_{m.group(2)}"
        p = f"decoder/{m.group(1)}/{sub}"
        return out_t(f"{p}/kernel") if m.group(3) == "weight" \
            else raw(f"{p}/bias")
    m = re.match(r"decoder\.out_sem\.(weight|bias)$", k)
    if m:   # num_semantic_linears == 1: plain Linear
        return out_t("decoder/out_sem/kernel") if m.group(1) == "weight" \
            else raw("decoder/out_sem/bias")
    m = re.match(r"decoder\.query_embed\.weight$", k)
    if m:
        return [("params", "decoder/query_embed/embedding", arr)]
    m = re.match(r"decoder\.norm(1|2)\.(\d+)\.(weight|bias)$", k)
    if m:
        ours = "ca_norm" if m.group(1) == "1" else "sa_norm"
        return raw(f"decoder/{ours}_{m.group(2)}/{_LN[m.group(3)]}")
    m = re.match(r"decoder\.(cross|self)_attn_layers\.(\d+)\.out_proj\."
                 r"(weight|bias)$", k)
    if m:
        ours = "ca_out_proj" if m.group(1) == "cross" else "sa_out_proj"
        p = f"decoder/{ours}_{m.group(2)}"
        return out_t(f"{p}/kernel") if m.group(3) == "weight" \
            else raw(f"{p}/bias")
    m = re.match(r"decoder\.(ca|sa)_(qcontent|kcontent|kpos|qpos|v|qpos_sine)"
                 r"_proj\.(\d+)\.(weight|bias)$", k)
    if m:
        p = f"decoder/{m.group(1)}_{m.group(2)}_proj_{m.group(3)}"
        return out_t(f"{p}/kernel") if m.group(4) == "weight" \
            else raw(f"{p}/bias")
    m = re.match(r"decoder\.ca_qpos_proj\.(weight|bias)$", k)
    if m:
        return out_t("decoder/ca_qpos_proj/kernel") if m.group(1) == "weight" \
            else raw("decoder/ca_qpos_proj/bias")
    m = re.match(r"decoder\.ffn_layers\.(\d+)\.net\.(0|3)\.(weight|bias)$", k)
    if m:
        lin = "lin1" if m.group(2) == "0" else "lin2"
        p = f"decoder/ffn_{m.group(1)}/{lin}"
        return out_t(f"{p}/kernel") if m.group(3) == "weight" \
            else raw(f"{p}/bias")
    m = re.match(r"decoder\.ffn_layers\.(\d+)\.norm\.(weight|bias)$", k)
    if m:
        return raw(f"decoder/ffn_{m.group(1)}/norm/{_LN[m.group(2)]}")
    m = re.match(r"decoder\.(ref_point_head|ref_anchor_head)\.layers\.(\d+)\."
                 r"(weight|bias)$", k)
    if m:
        p = f"decoder/{m.group(1)}/layers_{m.group(2)}"
        return out_t(f"{p}/kernel") if m.group(3) == "weight" \
            else raw(f"{p}/bias")
    m = re.match(r"decoder\.(bbox_embed|bbox_size_embed)\.(\d+)\.layers\."
                 r"(\d+)\.(weight|bias)$", k)
    if m:
        p = f"decoder/{m.group(1)}_{m.group(2)}/layers_{m.group(3)}"
        return out_t(f"{p}/kernel") if m.group(4) == "weight" \
            else raw(f"{p}/bias")
    m = re.match(r"decoder\.dinox_query_cross_attn_layers\.(\d+)\."
                 r"(attn\.in_proj_weight|attn\.in_proj_bias|"
                 r"attn\.out_proj\.weight|attn\.out_proj\.bias|"
                 r"norm\.weight|norm\.bias)$", k)
    if m:
        p = f"decoder/dinox_ca_{m.group(1)}"
        leaf = m.group(2)
        if leaf == "attn.in_proj_weight":
            d = arr.shape[0] // 3
            return [("params", f"{p}/q_proj/kernel", arr[:d].T),
                    ("params", f"{p}/k_proj/kernel", arr[d:2 * d].T),
                    ("params", f"{p}/v_proj/kernel", arr[2 * d:].T)]
        if leaf == "attn.in_proj_bias":
            d = arr.shape[0] // 3
            return [("params", f"{p}/q_proj/bias", arr[:d]),
                    ("params", f"{p}/k_proj/bias", arr[d:2 * d]),
                    ("params", f"{p}/v_proj/bias", arr[2 * d:])]
        if leaf == "attn.out_proj.weight":
            return out_t(f"{p}/out_proj/kernel")
        if leaf == "attn.out_proj.bias":
            return raw(f"{p}/out_proj/bias")
        return raw(f"{p}/norm/{_LN[leaf.split('.')[-1]]}")
    return None


def import_state_dict(sd: Dict, kernel_order: str = "x_slowest"
                      ) -> Tuple[Dict, Dict, List[str]]:
    """Translate a (cleaned) torch state dict.

    Returns ``(params, batch_stats, unmapped_keys)`` as nested dicts
    mirroring our flax collections.
    """
    params: Dict = {}
    stats: Dict = {}
    unmapped: List[str] = []

    def np_of(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        res = _translate(k, np_of(v), kernel_order)
        if res is None:
            unmapped.append(k)
            continue
        for coll, path, arr in res:
            _set(params if coll == "params" else stats, path, arr)
    return params, stats, unmapped


def import_checkpoint(path: str, kernel_order: str = "x_slowest",
                      key: str = "model") -> Tuple[Dict, Dict, List[str]]:
    """Load a torch checkpoint file and convert it."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get(key, blob) if isinstance(blob, dict) else blob
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_state_dict(clean_state_dict(dict(sd)), kernel_order)


# -------------------------- legacy API shims --------------------------


def load_torch_checkpoint(path: str, model=None,
                          kernel_order: str = "x_slowest",
                          key: str = "model") -> Dict:
    params, _stats, unmapped = import_checkpoint(path, kernel_order, key)
    if unmapped:
        print(f"[torch_import] {len(unmapped)} unmapped keys, e.g. "
              f"{unmapped[:5]}")
    return params


def batch_stats_from_torch(path: str, key: str = "model") -> Dict:
    _params, stats, _un = import_checkpoint(path, key=key)
    return stats
