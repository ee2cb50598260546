"""Checkpoint-bridge round-trip: full coverage, zero unmapped keys.

Three layers of assurance (no real released checkpoint is available in
this container, so the naming itself is made testable):

* the decoder mapping is checked against the *actual reference module*:
  ``ScanNetQueryDecoder`` from ``/root/reference`` is instantiated (via
  ``tests/reference_import.py`` stubs) with the shipped ScanNet200 config
  and its real ``state_dict()`` must translate with zero unmapped keys to
  exactly our flax decoder tree (same paths, same shapes);
* the Res16UNet / SpConvUNet mappings are checked by inverse-constructing
  a torch state dict from our init tree (following the reference's module
  attribute naming, ``minkunet.py:365-529`` / ``spconvunet.py:21-226``),
  importing it, and asserting the values round-trip exactly;
* kernel-layout transforms (ME offset permutation, spconv KRSC/RSCK) are
  unit-checked.
"""
import sys, os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from segdino3d_tpu.train.torch_import import (import_state_dict,
                                              kernel_permutation)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _ref_decoder():
    from reference_import import load_reference_modules
    ref = load_reference_modules()
    if ref is None:
        pytest.skip("reference tree or torch unavailable")
    return ref["decoder"].ScanNetQueryDecoder(
        add_dinox_query_ca=True, add_dinox_query_ca_mask=True,
        dinox_query_ca_mask_threshold=0.2,
        num_layers=6, num_instance_queries=0, num_semantic_queries=0,
        num_instance_classes=198, num_semantic_classes=200,
        num_semantic_linears=1, in_channels=96, d_model=256, num_heads=8,
        hidden_dim=1024, dropout=0.0, activation_fn="gelu", iter_pred=True,
        attn_mask=True, fix_attention=True, objectness_flag=False,
        add_box_size_pred=True, add_positional_embedding=True,
        pos_type="sine", temperature=20, box_modulate_ca=True,
        normalize_box_prediction=True)


class TestDecoderRoundtrip:
    def test_reference_state_dict_fully_mapped(self):
        dec = _ref_decoder()
        sd = {f"decoder.{k}": v for k, v in dec.state_dict().items()}
        params, stats, unmapped = import_state_dict(sd)
        assert unmapped == [], unmapped[:10]
        assert stats == {}

        # our decoder tree at the same config
        from segdino3d_tpu.models.decoder.query_decoder import \
            ScanNetQueryDecoder
        ours = ScanNetQueryDecoder(
            num_layers=6, num_instance_classes=198, num_semantic_classes=200,
            in_channels=96, d_model=256, num_heads=8, hidden_dim=1024,
            dropout=0.0, activation_fn="gelu", iter_pred=True,
            attn_mask=True, fix_attention=True, objectness_flag=False,
            add_dinox_query_ca=True, add_dinox_query_ca_mask=True,
            add_positional_embedding=True, pos_type="sine", temperature=20,
            add_box_size_pred=True, box_modulate_ca=True,
            normalize_box_prediction=True)
        B, S, Q, K = 1, 8, 8, 4
        rng = np.random.RandomState(0)
        f32 = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
        variables = ours.init(
            {"params": jax.random.PRNGKey(0)},
            f32(B, S, 96), jnp.ones((B, S), bool), f32(B, S, 3),
            f32(B, S, 3), f32(B, Q, 96), jnp.ones((B, Q), bool),
            f32(B, Q, 3), f32(B, K, 256), f32(B, K, 3),
            jnp.ones((B, K), bool),
            jnp.asarray(np.stack([np.full((B, 3), -1.0),
                                  np.full((B, 3), 1.0)], 1),
                        jnp.float32))
        got = _flatten(params["decoder"])
        want = _flatten(variables["params"])
        assert set(got) == set(want), (
            sorted(set(want) - set(got))[:8], sorted(set(got) - set(want))[:8])
        for k in want:
            assert got[k].shape == want[k].shape, (k, got[k].shape,
                                                   want[k].shape)


def _inv_perm(k, order="x_slowest"):   # importer default (identity; see
    # train/torch_import.py:kernel_permutation for the ME derivation)
    perm = kernel_permutation(k, order)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv


def _me_torch_kernel(target):
    """Inverse of the importer's ME-kernel transform."""
    vol = target.shape[0]
    k = round(vol ** (1 / 3))
    if k ** 3 == vol and vol > 1:
        return target[_inv_perm(k)]
    return target


def _spconv_torch_kernel(target):
    """Our (k^3, Cin, Cout) -> spconv KRSC (Cout, k, k, k, Cin)."""
    vol, cin, cout = target.shape
    k = round(vol ** (1 / 3))
    return np.moveaxis(target.reshape(k, k, k, cin, cout), -1, 0)


def build_res16_torch_sd(want_p, want_s, rng):
    """Inverse-construct a torch state dict per minkunet.py module naming.

    ``want_p``/``want_s`` are flat ``{path: array}`` dicts of our flax
    Res16UNet tree; each entry is REPLACED in place with a fresh random
    target value, and the returned torch state dict encodes those targets
    under the reference's ``backbone.*`` keys (kernel layouts inverted so
    the importer recovers the targets exactly).
    """
    sd = {}
    for path, arr in want_p.items():
        parts = path.split("/")
        name = parts[0]
        target = rng.randn(*arr.shape).astype(np.float32)
        want_p[path] = target
        if name.startswith("conv"):          # stem / down / up convs
            sd[f"backbone.{name}.kernel"] = _me_torch_kernel(target)
        elif name.startswith("bn"):          # bn0..4, bntr4..7
            leaf = "weight" if parts[1] == "scale" else "bias"
            sd[f"backbone.{name}.bn.{leaf}"] = target
        else:                                 # blockN_R
            n, r = name[5], name[7]
            sub, leaf = parts[1], parts[2]
            if sub in ("conv1", "conv2"):
                sd[f"backbone.block{n}.{r}.{sub}.kernel"] = \
                    _me_torch_kernel(target)
            elif sub == "downsample_conv":
                sd[f"backbone.block{n}.{r}.downsample.0.kernel"] = \
                    target[None]
            elif sub == "downsample_norm":
                t = "weight" if leaf == "scale" else "bias"
                sd[f"backbone.block{n}.{r}.downsample.1.bn.{t}"] = target
            else:                             # norm1 / norm2
                t = "weight" if leaf == "scale" else "bias"
                sd[f"backbone.block{n}.{r}.{sub}.bn.{t}"] = target
    for path, arr in want_s.items():
        parts = path.split("/")
        name, leaf = parts[0], parts[-1]
        t = "running_mean" if leaf == "mean" else "running_var"
        target = rng.randn(*arr.shape).astype(np.float32)
        want_s[path] = target
        if name.startswith("bn"):
            sd[f"backbone.{name}.bn.{t}"] = target
        else:
            n, r = name[5], name[7]
            sub = parts[1]
            if sub == "downsample_norm":
                sd[f"backbone.block{n}.{r}.downsample.1.bn.{t}"] = target
            else:
                sd[f"backbone.block{n}.{r}.{sub}.bn.{t}"] = target
    sd["backbone.bn0.bn.num_batches_tracked"] = np.asarray(3)
    return sd


class TestRes16UNetRoundtrip:
    @pytest.mark.slow
    def test_full_tree_roundtrip(self):
        from segdino3d_tpu.models.backbone.res16unet import Res16UNet34C
        from segdino3d_tpu.ops.host_plan import (build_host_plan,
                                                 host_plan_to_device)

        rng = np.random.RandomState(0)
        coords = rng.randint(0, 16, (300, 3)).astype(np.float32)
        plan = build_host_plan(coords, np.zeros(300, np.int32),
                               np.ones(300, bool), [512, 256, 128, 64, 32])
        uplan, _ = host_plan_to_device(plan)
        model = Res16UNet34C(in_channels=35, out_channels=96)
        feats = jnp.asarray(rng.randn(512, 35).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), feats, uplan, False)

        want_p = _flatten(variables["params"])
        want_s = _flatten(variables["batch_stats"])
        sd = build_res16_torch_sd(want_p, want_s, rng)

        params, stats, unmapped = import_state_dict(sd)
        assert unmapped == [], unmapped[:10]
        got_p = _flatten(params["backbone"]["unet"])
        got_s = _flatten(stats["backbone"]["unet"])
        assert set(got_p) == set(want_p)
        assert set(got_s) == set(want_s)
        for k in want_p:
            np.testing.assert_array_equal(got_p[k], want_p[k], err_msg=k)
        for k in want_s:
            np.testing.assert_array_equal(got_s[k], want_s[k], err_msg=k)


def build_spconv_torch_sd(want_p, want_s, rng):
    """Inverse-construct a torch state dict per spconvunet.py module naming
    (reference ``spconvunet.py:21-226``); same replace-in-place contract as
    ``build_res16_torch_sd``."""

    def bn_key(base, leaf):
        t = {"scale": "weight", "bias": "bias",
             "mean": "running_mean", "var": "running_var"}[leaf]
        return f"{base}.{t}"

    sd = {}

    def torch_base(name):
        """our level-flattened module name -> reference recursive path"""
        if name == "input_conv":
            return "backbone.input_conv.0"
        if name == "output_norm":
            return "backbone.output_layer.0"
        if name.startswith("down_conv_"):
            l = int(name.rsplit("_", 1)[1])
            return "backbone." + "u." * l + "conv.2"
        if name.startswith("down_norm_"):
            l = int(name.rsplit("_", 1)[1])
            return "backbone." + "u." * l + "conv.0"
        if name.startswith("up_conv_"):
            l = int(name.rsplit("_", 1)[1])
            return "backbone." + "u." * l + "deconv.2"
        if name.startswith("up_norm_"):
            l = int(name.rsplit("_", 1)[1])
            return "backbone." + "u." * l + "deconv.0"
        # blocks_l{l}_{r} / tail_l{l}_{r}
        stage, lr = name.split("_l")
        l, r = lr.split("_")
        mod = "blocks" if stage == "blocks" else "blocks_tail"
        return "backbone." + "u." * int(l) + f"{mod}.block{r}"

    for want in (want_p, want_s):
        for path, arr in want.items():
            parts = path.split("/")
            name = parts[0]
            target = rng.randn(*arr.shape).astype(np.float32)
            want[path] = target
            base = torch_base(name)
            if len(parts) == 2 and parts[1] == "kernel":
                # conv modules (input/down/up): 5-d spconv KRSC weight
                sd[f"{base}.weight"] = _spconv_torch_kernel(target)
            elif len(parts) == 2:            # bare BN (down/up/output)
                sd[bn_key(base, parts[1])] = target
            elif parts[1] == "i_branch":
                k1 = np.moveaxis(target[None, None, None], -1, 0)
                sd[f"{base}.i_branch.0.weight"] = k1
            else:
                sub, leaf = parts[1], parts[2]
                idx = {"norm1": 0, "conv1": 2, "norm2": 3, "conv2": 5}[sub]
                if leaf == "kernel":
                    sd[f"{base}.conv_branch.{idx}.weight"] = \
                        _spconv_torch_kernel(target)
                else:
                    sd[bn_key(f"{base}.conv_branch.{idx}", leaf)] = target
    return sd


class TestSpConvUNetRoundtrip:
    @pytest.mark.slow
    def test_full_tree_roundtrip(self):
        from segdino3d_tpu.models.backbone.spconv_unet import SpConvUNet
        from segdino3d_tpu.ops.host_plan import (build_host_plan,
                                                 host_plan_to_device)

        rng = np.random.RandomState(1)
        coords = rng.randint(0, 16, (300, 3)).astype(np.float32)
        plan = build_host_plan(coords, np.zeros(300, np.int32),
                               np.ones(300, bool), [512, 256, 128, 64, 32],
                               stem_kernel=3)
        uplan, _ = host_plan_to_device(plan)
        model = SpConvUNet(in_channels=38)
        feats = jnp.asarray(rng.randn(512, 38).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), feats, uplan, False)

        want_p = _flatten(variables["params"])
        want_s = _flatten(variables["batch_stats"])
        sd = build_spconv_torch_sd(want_p, want_s, rng)

        params, stats, unmapped = import_state_dict(sd)
        assert unmapped == [], unmapped[:10]
        got_p = _flatten(params["backbone"]["unet"])
        got_s = _flatten(stats["backbone"]["unet"])
        assert set(got_p) == set(want_p), (
            sorted(set(want_p) - set(got_p))[:8],
            sorted(set(got_p) - set(want_p))[:8])
        assert set(got_s) == set(want_s)
        for k in want_p:
            np.testing.assert_array_equal(got_p[k], want_p[k], err_msg=k)


class TestKernelTransforms:
    def test_spconv_layout_sniff(self):
        from segdino3d_tpu.train.torch_import import _spconv_kernel

        a = np.arange(2 * 3 * 3 * 3 * 5).reshape(5, 3, 3, 3, 2).astype(float)
        out = _spconv_kernel(a)            # KRSC -> (27, 2, 5)
        assert out.shape == (27, 2, 5)
        b = np.moveaxis(a, 0, -1)          # RSCK input
        out2 = _spconv_kernel(b.reshape(3, 3, 3, 2, 5))
        np.testing.assert_array_equal(out, out2)

    def test_me_permutation_roundtrip(self):
        """Both enumeration hypotheses must round-trip (the harness's
        auto-disambiguation relies on each being self-consistent)."""
        from segdino3d_tpu.train.torch_import import _me_kernel

        for order in ("x_slowest", "x_fastest"):
            for k in (2, 3, 5):
                target = np.random.randn(k ** 3, 4, 6)
                torch_arr = target[_inv_perm(k, order)]
                np.testing.assert_array_equal(_me_kernel(torch_arr, order),
                                              target)
