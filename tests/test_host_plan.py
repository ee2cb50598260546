"""Host (C++) plan builder vs on-device hash engine parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdino3d_tpu.data.collate import PadSpec, attach_host_plan, collate
from segdino3d_tpu.data.synthetic import synthetic_scene
from segdino3d_tpu.models.backbone.res16unet import Res16UNet34C, build_unet_plan
from segdino3d_tpu.models.backbone.wrapper import SparseBackboneWrapper
from segdino3d_tpu.ops import sparse_conv as SC
from segdino3d_tpu.ops.host_plan import build_host_plan
from segdino3d_tpu.ops.voxelize import voxelize


def test_host_vs_device_dedup_and_maps():
    rng = np.random.RandomState(0)
    n = 5000
    coords = rng.uniform(0, 40, (n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-100:] = False
    bidx = np.zeros(n, np.int32)

    host = build_host_plan(coords, bidx, valid, level_caps=[n, n, n],
                           num_levels=3, stem_kernel=5)
    assert not host.overflow

    grid = voxelize(jnp.asarray(bidx), jnp.asarray(coords),
                    None, jnp.asarray(valid))
    dev_plan = SC.build_conv_plan(grid, 3)
    k3 = SC.kernel_offsets(3)

    # same voxel count & identical inverse mapping (both first-occurrence)
    assert host.levels[0].num_voxels == int(grid.num_voxels)
    np.testing.assert_array_equal(host.inverse_mapping,
                                  np.asarray(grid.inverse_mapping))

    # neighbor tables identical (same voxel ordering)
    dev_nbr = np.asarray(SC._neighbor_table(dev_plan.levels[0], k3))
    nv = host.levels[0].num_voxels
    np.testing.assert_array_equal(host.levels[0].subm_nbr[:, :nv],
                                  dev_nbr[:, :nv])
    # parent links identical
    np.testing.assert_array_equal(
        host.levels[0].parent_idx[:nv],
        np.asarray(dev_plan.levels[0].parent_idx)[:nv])
    np.testing.assert_array_equal(
        host.levels[0].parent_kpos[:nv],
        np.asarray(dev_plan.levels[0].parent_kpos)[:nv])
    assert host.levels[1].num_voxels == int(dev_plan.levels[1].num_voxels)


@pytest.mark.slow
def test_backbone_host_plan_matches_device():
    rec = synthetic_scene(0, n_points=2000, n_superpoints=32, n_classes=10,
                          feat_dim_2d=8, extent=3.0)
    spec = PadSpec(2048, 32, 16, 16, 10)
    batch = collate([rec], spec)

    unet = Res16UNet34C(in_channels=3 + 8, out_channels=96,
                        config=dict(bn_momentum=0.02, conv1_kernel_size=5))
    bb = SparseBackboneWrapper(unet=unet, voxel_size=0.05, s_cap=32,
                               voxel_cap=2048,
                               level_cap_ratios=(1, 1, 1, 1, 1))
    variables = bb.init(jax.random.PRNGKey(0), batch, False)
    out_dev = bb.apply(variables, batch, False)

    batch_hp = attach_host_plan(batch, [rec], spec, voxel_size=0.05,
                                voxel_cap=2048,
                                level_cap_ratios=(1, 1, 1, 1, 1))
    out_host = bb.apply(variables, batch_hp, False)
    np.testing.assert_allclose(np.asarray(out_dev.sp_feats),
                               np.asarray(out_host.sp_feats),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_dev.sp_pos),
                               np.asarray(out_host.sp_pos), atol=1e-5)


def test_probe_voxel_count_small_cap_terminates():
    """probe_voxel_count must not hang: the C++ dedup map sizes by n
    (an undersized open-addressing table would probe forever)."""
    import numpy as np
    from segdino3d_tpu.ops.host_plan import probe_voxel_count

    rng = np.random.RandomState(0)
    coords = rng.randint(0, 50, (20000, 3)).astype(np.float32)
    n = probe_voxel_count(coords, np.zeros(20000, np.int32),
                          np.ones(20000, bool))
    assert 0 < n <= 20000
    # matches numpy unique
    uniq = len(np.unique(coords.astype(np.int32), axis=0))
    assert n == uniq


def test_auto_l0_layout_crossover(monkeypatch):
    """attach_host_plan downgrades level 0 to the gather layout when its
    block count would push the widest dense conv onto the chunked
    (lax.map) path — the mechanism behind the measured v5e crossover
    (L0-gather wins on 400k-pt multi-room scenes, hybrid on ~120k).  The
    budget rides SEGDINO_CONV_CHUNK_MB, shared with the conv itself."""
    import numpy as np
    from segdino3d_tpu.data.collate import PadSpec, collate, attach_host_plan
    from segdino3d_tpu.data.synthetic import synthetic_scene

    rec = synthetic_scene(0, n_points=2000, n_instances=4, n_superpoints=32,
                          n_classes=8, n_queries2d=8, feat_dim_2d=8)
    spec = PadSpec(2048, 32, 8, 8, 8)
    b0 = collate([rec], spec)
    kw = dict(voxel_size=0.05, voxel_cap=4096,
              level_cap_ratios=(1, 1, 1, 1, 1),
              block_edges=(4, 4, 4, 4, 4), stem_gather=True)
    b_hybrid = attach_host_plan(b0, [rec], spec, **kw)
    assert b_hybrid.unet_plan.blocks[0] is not None
    assert b_hybrid.unet_plan.stem_nbr is not None  # hybrid gather stem

    # shrink the chunk budget below this scene's padded-buffer size:
    # the plan must flip level 0 to gather (and still carry a stem)
    monkeypatch.setenv("SEGDINO_CONV_CHUNK_MB", "0.05")
    b_big = attach_host_plan(b0, [rec], spec, **kw)
    assert (b_big.unet_plan.blocks is None
            or b_big.unet_plan.blocks[0] is None)
    assert b_big.unet_plan.stem_nbr is not None
    assert b_big.unet_plan.subm_nbr[0] is not None
    # and the knob is OFF when auto_l0_layout is disabled
    b_off = attach_host_plan(b0, [rec], spec, auto_l0_layout=False, **kw)
    assert b_off.unet_plan.blocks[0] is not None


def test_exact_min_shift_matches_spconv_reference_quantization():
    """The spconv configs must reproduce the reference's voxel grid:
    it quantizes (p - p.min(0)) / voxel — subtract-then-divide, a
    NON-integer shift before flooring (spconvunet.py:286) — which
    assigns boundary points differently from our default policy
    (divide, then shift by a multiple of 16).  ``exact_min_shift``
    selects the reference behavior bit-exactly."""
    from segdino3d_tpu.data.collate import PadSpec, _plan_coords, collate

    rng = np.random.RandomState(11)
    n = 800
    xyz = rng.uniform(-3.3, 2.7, (n, 3)).astype(np.float32)
    rec = dict(points=np.hstack([xyz, np.zeros((n, 3), np.float32)]),
               superpoint_ids=np.zeros(n, np.int64),
               inst_labels=np.zeros(1, np.int64),
               point_inst_ids=np.zeros(n, np.int64))
    spec = PadSpec(1024, 16, 4, 4, 8)
    batch = collate([rec], spec, device=False)

    coords, valid, _ = _plan_coords(batch, [rec], 0.02,
                                    exact_min_shift=True)
    ref = (xyz - xyz.min(0)) / np.float32(0.02)
    np.testing.assert_array_equal(coords[0, :n], ref)      # bit-identical

    # the default (integer-shift) policy is floor-equivalent to NO shift,
    # which genuinely differs from the reference's non-integer shift on
    # boundary points — the flag is not cosmetic
    coords16, _, _ = _plan_coords(batch, [rec], 0.02,
                                  exact_min_shift=False)
    delta = np.floor(coords16[0, :n]) - np.floor(coords[0, :n])
    assert (delta != delta[0]).any()


def test_stem_compact_matches_gather_stem():
    """Degree-compacted stem (native stem_compact + stem_compact_conv)
    must equal the plain gather-GEMM stem exactly — same pairs, different
    execution order (D slot-gathers + overflow segment-sum vs 125
    per-offset gathers).  Small D forces a large overflow population so
    both paths are exercised."""
    from segdino3d_tpu.models.backbone.res16unet import make_level_ctxs
    from segdino3d_tpu.ops import sparse_conv as SC
    from segdino3d_tpu.ops.conv_ctx import CompactStemCtx
    from segdino3d_tpu.ops.host_plan import build_host_plan, host_plan_to_device

    r = synthetic_scene(3, n_points=12000, n_superpoints=96, n_classes=18,
                        feat_dim_2d=8)
    c = np.asarray(r["points"][:, :3], np.float32) / 0.02
    c -= np.floor(c.min(0) / 16.0) * 16.0
    bidx = np.zeros(c.shape[0], np.int32)
    valid = np.ones(c.shape[0], bool)
    caps = [10240, 6144, 3072, 1536, 768]

    plain = build_host_plan(c, bidx, valid, caps, stem_gather=True,
                            stem_compact=False, block_edges=[4, 4, 4, 4, 4])
    comp = build_host_plan(c, bidx, valid, caps, stem_gather=True,
                           stem_compact=True, stem_compact_slots=8,
                           block_edges=[4, 4, 4, 4, 4])
    assert comp.stem_slots is not None and comp.stem_nbr is None
    assert comp.stem_slots.shape[0] == 8
    assert int((comp.stem_ov_src >= 0).sum()) > 0  # overflow exercised

    nv = comp.levels[0].num_voxels
    v = comp.stem_slots.shape[1]
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(v, 19).astype(np.float32))
    w = jnp.asarray(rng.randn(125, 19, 8).astype(np.float32) * 0.1)
    vmask = jnp.arange(v) < nv

    ref = SC.subm_conv(feats, jnp.asarray(plain.stem_nbr), w, vmask)
    got = SC.stem_compact_conv(
        feats, w, jnp.asarray(comp.stem_slots),
        jnp.asarray(comp.stem_ov_src), jnp.asarray(comp.stem_ov_dst), vmask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    # device plan selects the compact ctx and computes the same thing
    uplan, _inv = host_plan_to_device(comp)
    _ctxs, stem_ctx = make_level_ctxs(uplan)
    assert isinstance(stem_ctx, CompactStemCtx)
    got2 = stem_ctx.subm(feats, w)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_stem_compact_auto_default_and_optout(monkeypatch):
    """Auto policy: the compacted stem is OPT-IN (measured ~3x slower
    than the plain 125-gather stem on v5e — see build_host_plan); the
    default is the plain table.  SEGDINO_STEM_COMPACT=1 enables it for
    k5 gather stems only; parity plans (subm_for_dense) and k3 stems
    always keep the plain table."""
    from segdino3d_tpu.ops.host_plan import build_host_plan

    r = synthetic_scene(1, n_points=4000, n_superpoints=48, n_classes=18,
                        feat_dim_2d=8)
    c = np.asarray(r["points"][:, :3], np.float32) / 0.02
    c -= np.floor(c.min(0) / 16.0) * 16.0
    bidx = np.zeros(c.shape[0], np.int32)
    valid = np.ones(c.shape[0], bool)
    caps = [4096, 2048, 1024, 512, 256]

    monkeypatch.delenv("SEGDINO_STEM_COMPACT", raising=False)
    auto = build_host_plan(c, bidx, valid, caps, stem_gather=True,
                           block_edges=[4, 4, 4, 4, 4])
    assert auto.stem_slots is None and auto.stem_nbr is not None

    monkeypatch.setenv("SEGDINO_STEM_COMPACT", "1")
    opt = build_host_plan(c, bidx, valid, caps, stem_gather=True,
                          block_edges=[4, 4, 4, 4, 4])
    assert opt.stem_slots is not None and opt.stem_nbr is None

    parity = build_host_plan(c, bidx, valid, caps, subm_for_dense=True,
                             block_edges=[4, 4, 4, 4, 4])
    assert parity.stem_slots is None and parity.stem_nbr is not None

    k3 = build_host_plan(c, bidx, valid, caps, stem_kernel=3)
    assert k3.stem_slots is None and k3.stem_nbr is not None


def test_attach_host_plan_level_caps_override():
    """``level_caps`` (measured, e.g. by the EvalLoader prescan or the
    bench probe) replaces the ratio-derived caps on levels 1+ — no ratio
    padding — while producing the same valid voxels per level."""
    from segdino3d_tpu.data.collate import PadSpec, attach_host_plan, collate

    r = synthetic_scene(2, n_points=6000, n_superpoints=64, n_classes=18,
                        n_queries2d=8, feat_dim_2d=8)
    spec = PadSpec(8192, 64, 8, 8, 18)
    b0 = collate([r], spec)
    kw = dict(voxel_size=0.02, block_edges=(4, 4, 4, 4, 4),
              stem_gather=True)

    by_ratio = attach_host_plan(b0, [r], spec, voxel_cap=8192,
                                level_cap_ratios=(1.0, 0.4, 0.15, 0.06,
                                                  0.025), **kw)
    nv = [int(lv.num_voxels) for lv in by_ratio.unet_plan.levels]

    tight = attach_host_plan(b0, [r], spec,
                             level_caps=[int(v * 1.02) for v in nv], **kw)
    for li, lv in enumerate(tight.unet_plan.levels):
        cap = lv.valid.shape[0]
        want = max(256, -(-int(nv[li] * 1.02) // 256) * 256)
        assert cap == want, (li, cap, want)
        assert int(lv.num_voxels) == nv[li]
    # levels 1+ got strictly tighter than the ratio padding
    ratio_caps = [lv.valid.shape[0] for lv in by_ratio.unet_plan.levels]
    tight_caps = [lv.valid.shape[0] for lv in tight.unet_plan.levels]
    assert tight_caps[1] < ratio_caps[1]
