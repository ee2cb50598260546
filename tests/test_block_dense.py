"""Block-dense conv path: parity against the gather-GEMM reference path.

The block-dense layout (``ops.block_dense``) must reproduce submanifold
conv semantics exactly (reference: spconv SubMConv3d /
MinkowskiConvolution, ``/root/reference/segdino3d/models/backbone/
spconvunet.py:42-60``): output coords == input coords, absent neighbors
contribute zero.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segdino3d_tpu.ops.host_plan import (block_bucket, build_host_plan,
                                         host_plan_to_device)
from segdino3d_tpu.ops import block_dense as BD
from segdino3d_tpu.ops import sparse_conv as SC


def _plan(seed=0, n=2500, box=40, batches=2, edges=(8, 4, 8, 4, 8),
          caps=(4096, 2048, 1024, 512, 256)):
    rng = np.random.RandomState(seed)
    coords = np.concatenate(
        [rng.randint(0, box, (n, 3)) for _ in range(batches)]).astype(np.float32)
    bidx = np.repeat(np.arange(batches, dtype=np.int32), n)
    valid = np.ones(batches * n, bool)
    plan = build_host_plan(coords, bidx, valid, list(caps),
                           block_edges=list(edges), subm_for_dense=True)
    uplan, _ = host_plan_to_device(plan)
    return plan, uplan


class TestBlockDenseConv:
    def test_scatter_gather_roundtrip(self):
        _, uplan = _plan()
        rng = np.random.RandomState(1)
        for li in range(3):
            t = uplan.blocks[li]
            v = t.vox_slot.shape[0]
            valid = uplan.levels[li].valid
            feats = jnp.where(valid[:, None],
                              jnp.asarray(rng.randn(v, 8).astype(np.float32)),
                              0.0)
            back = BD.gather_from_dense(BD.scatter_to_dense(feats, t), t)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(feats))

    def test_occupancy_counts_valid_voxels(self):
        plan, uplan = _plan()
        for li in range(3):
            occ = BD.occupancy(uplan.blocks[li], uplan.levels[li].valid)
            assert int(occ.sum()) == plan.levels[li].num_voxels

    def test_occupancy_fast_path_matches_scatter(self):
        """Host-built tables (slot_vox present) take the elementwise
        occupancy path; it must equal the scatter derivation."""
        plan, uplan = _plan()
        for li in range(3):
            t = uplan.blocks[li]
            valid = uplan.levels[li].valid
            assert t.slot_vox is not None
            t_noinv = BD.BlockTables(t.vox_slot, t.block_nbr, t.edge, None)
            np.testing.assert_array_equal(
                np.asarray(BD.occupancy(t, valid)),
                np.asarray(BD.occupancy(t_noinv, valid)))

    @pytest.mark.parametrize("k", [3, 5])
    @pytest.mark.parametrize("chunk_mb", [None, 0.05])
    @pytest.mark.parametrize("l0_edge", [8, 4])
    def test_conv_parity_vs_gather(self, k, chunk_mb, l0_edge, monkeypatch):
        # l0_edge=4 regression-guards the halo exchange against absent
        # face blocks with present diagonal blocks (sparse occupancy at
        # small edges): an axis-sequential 6-face exchange silently
        # zeroed those diagonals' contributions
        if chunk_mb is not None:
            # force the chunked (lax.map over block shells) path
            monkeypatch.setattr(BD, "_CHUNK_BUDGET_BYTES",
                                int(chunk_mb * 2 ** 20))
        plan, uplan = _plan(edges=(l0_edge, 4, 8, 4, 8))
        rng = np.random.RandomState(2)
        for li in (0, 1):   # one edge-8 and one edge-4 level
            hl = plan.levels[li]
            v = hl.subm_nbr.shape[1]
            valid = uplan.levels[li].valid
            cin, cout = 16, 24
            feats = jnp.where(
                valid[:, None],
                jnp.asarray(rng.randn(v, cin).astype(np.float32)), 0.0)
            w = jnp.asarray(rng.randn(k ** 3, cin, cout).astype(np.float32)
                            * 0.1)
            if k == 3:
                nbr = jnp.asarray(hl.subm_nbr)
            elif li == 0:
                nbr = jnp.asarray(plan.stem_nbr)
            else:
                continue
            ref = SC.subm_conv(feats, nbr, w, valid)
            t = uplan.blocks[li]
            out = BD.dense_subm_conv(BD.scatter_to_dense(feats, t),
                                     BD.occupancy(t, valid), t, w)
            got = BD.gather_from_dense(out, t)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4, rtol=1e-4)

    def test_halo_pad_zero_outside(self):
        """Cells past every face of an isolated block read as zero."""
        nbr = jnp.full((26, 1), -1, jnp.int32)
        x = jnp.arange(1 * 4 * 4 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 4, 4, 2)
        p = BD.halo_pad(x, nbr, 1)
        assert p.shape == (1, 6, 6, 6, 2)
        np.testing.assert_array_equal(np.asarray(p[0, 0]), 0)
        np.testing.assert_array_equal(np.asarray(p[0, -1]), 0)
        np.testing.assert_array_equal(np.asarray(p[0, 1:5, 1:5, 1:5]),
                                      np.asarray(x[0]))

    def test_halo_pad_neighbor_slabs(self):
        """Two blocks adjacent along +x exchange their boundary slabs."""
        # block 0 at block-coord 0, block 1 at +x
        nbr = np.full((26, 2), -1, np.int32)
        nbr[BD.FACE_XP, 0] = 1   # block0's +x neighbor is block1
        nbr[BD.FACE_XM, 1] = 0   # block1's -x neighbor is block0
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 4, 4, 4, 3).astype(np.float32))
        p = BD.halo_pad(x, jnp.asarray(nbr), 1)
        # block0's +x halo plane == block1's x=0 plane
        np.testing.assert_array_equal(np.asarray(p[0, 5, 1:5, 1:5]),
                                      np.asarray(x[1, 0]))
        # block1's -x halo plane == block0's x=3 plane
        np.testing.assert_array_equal(np.asarray(p[1, 0, 1:5, 1:5]),
                                      np.asarray(x[0, 3]))

    def test_block_bucket_ladder(self):
        assert block_bucket(0) == 16
        assert block_bucket(16) == 16
        assert block_bucket(17) == 32
        prev = 16
        for n in range(1, 5000, 97):
            b = block_bucket(n)
            assert b >= n and b % 16 == 0
        # ladder is a fixed sequence: same inputs -> same bucket
        assert block_bucket(1000) == block_bucket(1000)


class TestBackboneDenseParity:
    @pytest.mark.slow
    def test_res16unet_dense_vs_gather(self):
        from segdino3d_tpu.models.backbone.res16unet import Res16UNet34C

        rng = np.random.RandomState(1)
        n = 900
        coords = rng.randint(0, 32, (n, 3)).astype(np.float32)
        bidx = np.zeros(n, np.int32)
        valid = np.ones(n, bool)
        caps = [1024, 512, 256, 128, 64]
        plan = build_host_plan(coords, bidx, valid, caps,
                               block_edges=[8, 8, 4, 4, 8],
                               subm_for_dense=True)
        up_dense, _ = host_plan_to_device(plan)
        # dense plans don't carry stem_nbr (it would select the hybrid
        # gather stem); re-attach it for the pure-gather variant
        up_gather = up_dense._replace(blocks=None,
                                      stem_nbr=jnp.asarray(plan.stem_nbr))
        feats = jnp.where(
            up_dense.levels[0].valid[:, None],
            jnp.asarray(rng.randn(caps[0], 19).astype(np.float32)), 0.0)
        model = Res16UNet34C(in_channels=19, out_channels=96)
        vars_ = jax.jit(model.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), feats, up_gather, False)
        ap = jax.jit(model.apply, static_argnums=(3,))
        out_g = ap(vars_, feats, up_gather, False)
        out_d = ap(vars_, feats, up_dense, False)
        # tolerance: fp32 reorder noise amplified through 29 BN/ReLU layers
        # (measured growth 5e-8 -> 4e-5 over the up path; no single layer
        # introduces structural error — see test_conv_parity_vs_gather)
        rel = float(jnp.abs(out_d - out_g).max() / jnp.abs(out_g).max())
        assert rel < 3e-3, rel

    @pytest.mark.slow
    def test_res16unet_hybrid_stem_gather(self):
        """Hybrid layout (stem_gather=True): gather-GEMM stem over a
        block-dense level 0 must match the pure gather path. This is the
        production inference layout (configs/models/base_3d.py)."""
        from segdino3d_tpu.models.backbone.res16unet import Res16UNet34C

        rng = np.random.RandomState(4)
        n = 900
        coords = rng.randint(0, 32, (n, 3)).astype(np.float32)
        bidx = np.zeros(n, np.int32)
        valid = np.ones(n, bool)
        caps = [1024, 512, 256, 128, 64]
        plan_h = build_host_plan(coords, bidx, valid, caps,
                                 block_edges=[4, 4, 4, 4, 4],
                                 stem_gather=True)
        up_hybrid, _ = host_plan_to_device(plan_h)
        # hybrid marker: plain gather stem over a block-dense level 0
        # (the compacted stem is opt-in — see host_plan.build_host_plan)
        assert up_hybrid.stem_nbr is not None
        assert up_hybrid.blocks[0] is not None
        plan_g = build_host_plan(coords, bidx, valid, caps,
                                 stem_compact=False)
        up_gather, _ = host_plan_to_device(plan_g)
        assert up_gather.stem_nbr is not None
        feats = jnp.where(
            up_hybrid.levels[0].valid[:, None],
            jnp.asarray(rng.randn(caps[0], 19).astype(np.float32)), 0.0)
        model = Res16UNet34C(in_channels=19, out_channels=96)
        vars_ = jax.jit(model.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), feats, up_gather, False)
        ap = jax.jit(model.apply, static_argnums=(3,))
        out_g = ap(vars_, feats, up_gather, False)
        out_h = ap(vars_, feats, up_hybrid, False)
        rel = float(jnp.abs(out_h - out_g).max() / jnp.abs(out_g).max())
        assert rel < 3e-3, rel


class TestHaloPadGrad:
    def test_shell_mirror_order(self):
        shell = BD._shell_dirs()
        for i, d in enumerate(shell):
            assert shell[25 - i] == tuple(-x for x in d)

    def test_grad_matches_autodiff(self):
        """Custom VJP (mirrored halo-gather) == autodiff scatter backward,
        on a real C++-built neighbor table with absent neighbors."""
        plan, uplan = _plan(seed=5, n=400, box=16, batches=1,
                            edges=(4, 4, 4, 4, 4),
                            caps=(1024, 512, 256, 128, 64))
        t = uplan.blocks[0]
        rng = np.random.RandomState(2)
        nb = int(t.num_blocks)
        for h in (1, 2):
            x = jnp.asarray(rng.randn(nb, t.edge, t.edge, t.edge, 3)
                            .astype(np.float32))
            cot = jnp.asarray(
                rng.randn(nb, t.edge + 2 * h, t.edge + 2 * h,
                          t.edge + 2 * h, 3).astype(np.float32))

            g_custom = jax.grad(
                lambda v: (BD.halo_pad(v, t.block_nbr, h) * cot).sum())(x)
            g_auto = jax.grad(
                lambda v: (BD._halo_pad_impl(v, t.block_nbr, h)
                           * cot).sum())(x)
            np.testing.assert_allclose(np.asarray(g_custom),
                                       np.asarray(g_auto),
                                       rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("k", [3, 5])
    def test_chunked_grad_matches_autodiff(self, k):
        """The chunked path's custom VJP (mirror-conv d_x + scanned dW)
        == autodiff through the chunk assembly's gathers, for both
        operands, with occ masking, absent neighbors, and a block count
        not divisible by the chunk size."""
        plan, uplan = _plan(seed=7, n=700, box=24, batches=1,
                            edges=(4, 4, 4, 4, 4),
                            caps=(2048, 512, 256, 128, 64))
        t = uplan.blocks[0]
        valid = uplan.levels[0].valid
        occ = BD.occupancy(t, valid)
        rng = np.random.RandomState(3)
        v = t.vox_slot.shape[0]
        cin, cout = 6, 5
        feats = jnp.where(valid[:, None],
                          jnp.asarray(rng.randn(v, cin).astype(np.float32)),
                          0.0)
        dense = BD.scatter_to_dense(feats, t)
        w = jnp.asarray(rng.randn(k ** 3, cin, cout).astype(np.float32) * .1)
        cot = jnp.asarray(
            rng.randn(dense.shape[0], cout).astype(np.float32))
        # pick a chunk size that does NOT divide num_blocks, so the
        # chunk-padding (-1 ids) path is exercised too
        chunk = next(c for c in (3, 4, 5, 7) if int(t.num_blocks) % c)

        def custom(d, wt):
            return (BD._chunked_conv_cd(d, occ, wt, t.block_nbr,
                                        t.edge, k, chunk) * cot).sum()

        def auto(d, wt):
            return (BD._chunked_conv_impl(d, occ, wt, t.block_nbr,
                                          t.edge, k, chunk) * cot).sum()

        gd_c, gw_c = jax.grad(custom, argnums=(0, 1))(dense, w)
        gd_a, gw_a = jax.grad(auto, argnums=(0, 1))(dense, w)
        np.testing.assert_allclose(np.asarray(gd_c), np.asarray(gd_a),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_a),
                                   rtol=1e-4, atol=1e-5)


class TestBijectionTranspose:
    """The voxel <-> dense-slot map is a bijection on valid entries: with
    the plan's inverse table, gather_from_dense's VJP is the mirror
    gather (``BD._bijection_take``) instead of autodiff's scatter-add.
    Values must be bit-identical and grads must match autodiff of the
    scatter formulation.  (The forward of scatter_to_dense deliberately
    stays a scatter — the gather formulation measured ~7 ms/step slower,
    see its docstring.)"""

    def test_matches_scatter_fallback_and_grads(self):
        _, uplan = _plan()
        rng = np.random.RandomState(7)
        for li in range(2):
            t = uplan.blocks[li]
            assert t.slot_vox is not None
            t_fb = BD.BlockTables(t.vox_slot, t.block_nbr, t.edge)
            v = t.vox_slot.shape[0]
            valid = uplan.levels[li].valid
            feats = jnp.where(
                valid[:, None],
                jnp.asarray(rng.randn(v, 8).astype(np.float32)), 0.0)

            d_bij = BD.scatter_to_dense(feats, t)
            d_fb = BD.scatter_to_dense(feats, t_fb)
            np.testing.assert_array_equal(np.asarray(d_bij), np.asarray(d_fb))

            dense = jnp.asarray(
                rng.randn(d_fb.shape[0], 8).astype(np.float32))
            np.testing.assert_array_equal(
                np.asarray(BD.gather_from_dense(dense, t)),
                np.asarray(BD.gather_from_dense(dense, t_fb)))

            np.testing.assert_array_equal(
                np.asarray(BD.occupancy(t, valid)),
                np.asarray(BD.occupancy(t_fb, valid)))

            def f(x, tbl):
                return (BD.gather_from_dense(
                    BD.scatter_to_dense(x, tbl) * 1.7, tbl) ** 2).sum()

            g_bij = jax.grad(lambda x: f(x, t))(feats)
            g_fb = jax.grad(lambda x: f(x, t_fb))(feats)
            np.testing.assert_allclose(np.asarray(g_bij), np.asarray(g_fb),
                                       rtol=1e-6, atol=1e-6)
