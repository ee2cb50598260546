"""Unit tests for coordinate keys, hashing, voxelization, kernel maps."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdino3d_tpu.ops import keys as K
from segdino3d_tpu.ops import scatter
from segdino3d_tpu.ops import sparse_conv as SC
from segdino3d_tpu.ops.hashing import build_hash, lookup_hash
from segdino3d_tpu.ops.voxelize import voxelize, devoxelize


def _rand_coords(n, extent=50, batch=2, seed=0):
    rng = np.random.RandomState(seed)
    b = rng.randint(0, batch, size=n)
    xyz = rng.randint(0, extent, size=(n, 3))
    return np.concatenate([b[:, None], xyz], axis=1).astype(np.int32)


class TestKeys:
    def test_pack_lookup_roundtrip(self):
        coords = np.unique(_rand_coords(500), axis=0)
        n = coords.shape[0]
        valid = np.ones(n, bool)
        hi, lo = K.pack_coords(jnp.asarray(coords), jnp.asarray(valid))
        s_hi, s_lo, s_idx = K.lexsort_keys(hi, lo, jnp.arange(n, dtype=jnp.int32))
        found = K.lookup_coords(s_hi, s_lo, hi, lo)
        assert (np.asarray(found) >= 0).all()
        np.testing.assert_array_equal(np.asarray(s_idx)[np.asarray(found)], np.arange(n))


class TestHash:
    def test_insert_lookup_roundtrip(self):
        coords = np.unique(_rand_coords(3000, extent=64, batch=4, seed=2), axis=0)
        n = coords.shape[0]
        key = K.pack_coords_u32(jnp.asarray(coords), jnp.ones(n, bool))
        vals = jnp.arange(n, dtype=jnp.int32) * 3
        h = build_hash(key, vals, jnp.ones(n, bool), capacity=n)
        assert not bool(h.overflow)
        got = lookup_hash(h, key)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(vals))

    def test_lookup_missing_and_invalid(self):
        coords = jnp.asarray([[0, 1, 1, 1], [0, 2, 2, 2]], jnp.int32)
        key = K.pack_coords_u32(coords, jnp.ones(2, bool))
        h = build_hash(key, jnp.asarray([5, 7], jnp.int32),
                       jnp.ones(2, bool), capacity=2)
        q = jnp.asarray([[0, 1, 1, 1], [0, 9, 9, 9]], jnp.int32)
        q_key = K.pack_coords_u32(q, jnp.ones(2, bool))
        res = np.asarray(lookup_hash(h, q_key))
        assert res[0] == 5 and res[1] == -1
        # invalid queries always miss
        res2 = np.asarray(lookup_hash(h, q_key, jnp.zeros(2, bool)))
        assert (res2 == -1).all()

    def test_duplicate_keys_deterministic(self):
        coords = jnp.asarray([[0, 1, 1, 1]] * 5, jnp.int32)
        key = K.pack_coords_u32(coords, jnp.ones(5, bool))
        h = build_hash(key, jnp.arange(5, dtype=jnp.int32),
                       jnp.ones(5, bool), capacity=5)
        got = int(np.asarray(lookup_hash(h, key[:1]))[0])
        assert got == 0  # smallest index wins

    def test_out_of_range_coords_sentinel(self):
        coords = jnp.asarray([[0, 1, 1, 1], [0, 5000, 1, 1]], jnp.int32)
        key = K.pack_coords_u32(coords, jnp.ones(2, bool))
        assert int(np.asarray(key)[1]) == int(np.asarray(K.U32_SENTINEL))


class TestVoxelize:
    def test_matches_numpy_unique_mean(self):
        rng = np.random.RandomState(1)
        n = 1000
        pts = rng.uniform(0, 3.0, size=(n, 3)).astype(np.float32)
        feats = rng.randn(n, 4).astype(np.float32)
        b = rng.randint(0, 2, size=n).astype(np.int32)
        voxel_size = 0.25
        valid = np.ones(n, bool)
        valid[-50:] = False

        grid = voxelize(jnp.asarray(b), jnp.asarray(pts / voxel_size),
                        jnp.asarray(feats), jnp.asarray(valid))

        ijk = np.floor(pts / voxel_size).astype(np.int64)
        key = (b.astype(np.int64) << 48) | (ijk[:, 0] << 32) | \
            (ijk[:, 1] << 16) | ijk[:, 2]
        key = key[valid]
        uniq, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        assert int(grid.num_voxels) == len(uniq)
        assert not bool(grid.overflow)

        ref_feats = np.zeros((len(uniq), 4), np.float32)
        np.add.at(ref_feats, inv, feats[valid])
        ref_feats /= cnt[:, None]

        # order-independent comparison via the inverse mapping: every point's
        # voxel feature must equal the numpy per-voxel mean
        pt_feats = np.asarray(devoxelize(grid.feats, grid.inverse_mapping,
                                         jnp.asarray(valid)))
        np.testing.assert_allclose(pt_feats[valid], ref_feats[inv],
                                   rtol=1e-5, atol=1e-5)
        # points in the same voxel share the mapping; different voxels differ
        inv_map = np.asarray(grid.inverse_mapping)[valid]
        assert len(np.unique(inv_map)) == len(uniq)
        same = inv == inv[0]
        assert (inv_map[same] == inv_map[0]).all()

    def test_first_occurrence_order(self):
        """Unique inputs keep their order (winner = smallest point index)."""
        coords = np.unique(_rand_coords(64, extent=10, batch=1, seed=3), axis=0)
        rng = np.random.RandomState(0)
        rng.shuffle(coords)
        grid = voxelize(jnp.asarray(coords[:, 0]),
                        jnp.asarray(coords[:, 1:].astype(np.float32) + 0.5),
                        None, jnp.ones(len(coords), bool))
        np.testing.assert_array_equal(np.asarray(grid.coords), coords)

    def test_all_invalid(self):
        grid = voxelize(jnp.zeros(8, jnp.int32), jnp.zeros((8, 3)),
                        jnp.ones((8, 2)), jnp.zeros(8, bool))
        assert int(grid.num_voxels) == 0
        assert not np.asarray(grid.valid).any()


class TestScatter:
    def test_segment_mean(self):
        x = jnp.asarray([[1.0], [3.0], [5.0], [100.0]])
        ids = jnp.asarray([0, 0, 1, 2])
        valid = jnp.asarray([True, True, True, False])
        out = scatter.segment_mean(x, ids, 3, valid)
        np.testing.assert_allclose(np.asarray(out)[:, 0], [2.0, 5.0, 0.0])

    def test_segment_mean_stack_matches_separate(self):
        """The fused multi-array pooling is bit-identical to per-array
        segment_mean calls (mixed dtypes group into separate scatters)."""
        rng = np.random.RandomState(7)
        n, s = 4096, 33
        ids = jnp.asarray(rng.randint(0, s + 2, n))  # incl. out-of-range
        valid = jnp.asarray(rng.rand(n) > 0.1)
        a = jnp.asarray(rng.randn(n, 16).astype(np.float32))
        b = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        c = jnp.asarray(rng.randn(n, 8)).astype(jnp.bfloat16)
        outs = scatter.segment_mean_stack([a, b, c], ids, s, valid)
        for x, got in zip((a, b, c), outs):
            want = scatter.segment_mean(x, ids, s, valid)
            np.testing.assert_array_equal(np.asarray(got, np.float32),
                                          np.asarray(want, np.float32))


def _grid_of(coords):
    coords = np.asarray(coords, np.int32)
    return voxelize(jnp.asarray(coords[:, 0]),
                    jnp.asarray(coords[:, 1:].astype(np.float32) + 0.5),
                    None, jnp.ones(len(coords), bool))


class TestConvPlan:
    def test_downsample_unique(self):
        block = [[0, x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)]
        coords = block + [[0, 4, 4, 4]]
        grid = _grid_of(coords)
        plan = SC.build_conv_plan(grid, num_levels=2)
        lvl0, lvl1 = plan.levels
        assert int(lvl1.num_voxels) == 2
        got = np.asarray(lvl1.coords)[np.asarray(lvl1.valid)]
        np.testing.assert_array_equal(
            np.sort(got, axis=0), [[0, 0, 0, 0], [0, 2, 2, 2]])
        parents = np.asarray(lvl0.parent_idx)
        coords0 = np.asarray(lvl0.coords)
        in_block = coords0[:, 1] < 2
        assert len(set(parents[in_block])) == 1
        assert len(set(parents[~in_block])) == 1
        kpos = np.asarray(lvl0.parent_kpos)[in_block]
        assert sorted(kpos) == list(range(8))

    def test_subm_conv_center_only(self):
        coords = np.unique(_rand_coords(64, extent=10, batch=1, seed=3), axis=0)
        grid = _grid_of(coords)
        n = coords.shape[0]
        offsets = SC.kernel_offsets(3)
        nbr = SC._neighbor_table(plan_level0(grid), offsets)
        center = 13
        np.testing.assert_array_equal(np.asarray(nbr[center]), np.arange(n))

        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(n, 4).astype(np.float32))
        w = np.zeros((27, 4, 5), np.float32)
        w[center] = rng.randn(4, 5)
        out = SC.subm_conv(feats, nbr, jnp.asarray(w), grid.valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(feats) @ w[center],
                                   rtol=1e-5, atol=1e-5)

    def test_subm_conv_dense_parity(self):
        rng = np.random.RandomState(7)
        ext = 6
        coords = np.unique(_rand_coords(120, extent=ext, batch=1, seed=9), axis=0)
        n = coords.shape[0]
        grid = _grid_of(coords)
        feats = rng.randn(n, 3).astype(np.float32)
        w = rng.randn(27, 3, 2).astype(np.float32)

        offsets = SC.kernel_offsets(3)
        nbr = SC._neighbor_table(plan_level0(grid), offsets)
        out = np.asarray(SC.subm_conv(jnp.asarray(feats), nbr, jnp.asarray(w),
                                      grid.valid))

        sc = np.asarray(grid.coords)
        dense = np.zeros((ext + 4, ext + 4, ext + 4, 3), np.float32)
        dense[sc[:, 1] + 2, sc[:, 2] + 2, sc[:, 3] + 2] = feats
        for i in range(n):
            x, y, z = sc[i, 1] + 2, sc[i, 2] + 2, sc[i, 3] + 2
            ref = np.zeros(2, np.float32)
            for oi, (dx, dy, dz) in enumerate(offsets):
                ref += dense[x + dx, y + dy, z + dz] @ w[oi]
            np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)

    def test_down_up_conv_roundtrip_shapes(self):
        coords = np.unique(_rand_coords(200, extent=16, batch=2, seed=5), axis=0)
        grid = _grid_of(coords)
        plan = SC.build_conv_plan(grid, num_levels=2)
        lvl0, lvl1 = plan.levels
        n = coords.shape[0]
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(n, 4).astype(np.float32))
        wd = jnp.asarray(rng.randn(8, 4, 6).astype(np.float32))
        wu = jnp.asarray(rng.randn(8, 6, 4).astype(np.float32))
        down = SC.down_conv(feats, lvl0, lvl1, wd)
        assert down.shape == (n, 6)
        nv1 = int(lvl1.num_voxels)
        assert not np.asarray(down[nv1:]).any()
        up = SC.up_conv(down, lvl0, wu)
        assert up.shape == (n, 4)

    def test_down_conv_values(self):
        coords = [[0, 0, 0, 0], [0, 1, 0, 1]]
        grid = _grid_of(coords)
        plan = SC.build_conv_plan(grid, num_levels=2)
        lvl0, lvl1 = plan.levels
        feats = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        w = np.zeros((8, 2, 2), np.float32)
        for o in range(8):
            w[o] = np.eye(2) * (o + 1)
        out = np.asarray(SC.down_conv(feats, lvl0, lvl1, jnp.asarray(w)))
        np.testing.assert_allclose(out[0], [1.0, 6.0])
        wu = jnp.asarray(np.stack([np.eye(2, dtype=np.float32) * (o + 1)
                                   for o in range(8)]))
        up = np.asarray(SC.up_conv(jnp.asarray(out), lvl0, wu))
        srt = np.asarray(lvl0.coords)
        i000 = int(np.where((srt[:, 1:] == [0, 0, 0]).all(1))[0][0])
        i101 = int(np.where((srt[:, 1:] == [1, 0, 1]).all(1))[0][0])
        np.testing.assert_allclose(up[i000], [1.0, 6.0])
        np.testing.assert_allclose(up[i101], [6.0, 36.0])


def plan_level0(grid):
    return SC.Level(coords_T=grid.coords_T, key=grid.key, valid=grid.valid,
                    hash=grid.hash, num_voxels=grid.num_voxels,
                    parent_idx=None, parent_kpos=None)


class TestConvPaths:
    def test_premul_matches_im2col(self):
        """matmul-first (Cin >> Cout) path == gather-im2col path."""
        coords = np.unique(_rand_coords(150, extent=8, batch=1, seed=11), axis=0)
        grid = _grid_of(coords)
        n = coords.shape[0]
        offsets = SC.kernel_offsets(3)
        nbr = SC._neighbor_table(plan_level0(grid), offsets)
        rng = np.random.RandomState(4)
        cin, cout = 40, 4   # cin > 2*cout -> premul dispatch
        feats = jnp.asarray(rng.randn(n, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))
        out_premul = SC.subm_conv(feats, nbr, w, grid.valid)
        # force the im2col path by a fake small-cin dispatch: compute the
        # reference by direct accumulation
        ref = np.zeros((n, cout), np.float32)
        nb = np.asarray(nbr)
        fn = np.asarray(feats)
        wn = np.asarray(w)
        for o in range(27):
            sel = nb[o] >= 0
            ref[sel] += fn[nb[o][sel]] @ wn[o]
        np.testing.assert_allclose(np.asarray(out_premul), ref,
                                   rtol=1e-4, atol=1e-4)


class TestSubmConvGrad:
    """Custom-VJP (scatter-free mirror backward) vs plain autodiff of the
    underlying implementation."""

    def _setup(self, k, cin, cout, seed, n=150, extent=8, n_invalid=0):
        coords = np.unique(_rand_coords(n, extent=extent, batch=1,
                                        seed=seed), axis=0)
        grid = _grid_of(coords)
        nv = coords.shape[0]
        offsets = SC.kernel_offsets(k)
        nbr = SC._neighbor_table(plan_level0(grid), offsets)
        rng = np.random.RandomState(seed + 1)
        feats = jnp.asarray(rng.randn(nv, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k ** 3, cin, cout).astype(np.float32))
        valid = grid.valid
        if n_invalid:
            valid = jnp.asarray(
                np.asarray(valid) & (np.arange(nv) < nv - n_invalid))
            # neighbor tables encode validity; rebuild with masked level
            lvl = plan_level0(grid)._replace(valid=valid)
            nbr = SC._neighbor_table(lvl, offsets)
        cot = jnp.asarray(rng.randn(nv, cout).astype(np.float32))
        return feats, nbr, w, valid, cot

    def _compare(self, *args):
        feats, nbr, w, valid, cot = args

        def loss_custom(f, wt):
            return (SC.subm_conv(f, nbr, wt, valid) * cot).sum()

        def loss_auto(f, wt):
            return (SC._subm_conv_impl(f, nbr, wt, valid) * cot).sum()

        gf_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
        gf_a, gw_a = jax.grad(loss_auto, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_a),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_a),
                                   rtol=2e-4, atol=2e-4)

    def test_k3_im2col_shapes(self):
        self._compare(*self._setup(3, 6, 5, seed=21))

    def test_k3_widein_premul_forward(self):
        # cin > 2*cout selects the matmul-first forward; backward is shared
        self._compare(*self._setup(3, 24, 3, seed=22))

    def test_k5_stem_like(self):
        self._compare(*self._setup(5, 19, 4, seed=23, n=120, extent=6))

    def test_invalid_rows_get_zero_grad(self):
        feats, nbr, w, valid, cot = self._setup(3, 6, 5, seed=24,
                                                n_invalid=7)
        self._compare(feats, nbr, w, valid, cot)
        gf = jax.grad(lambda f: (SC.subm_conv(f, nbr, w, valid)
                                 * cot).sum())(feats)
        assert np.all(np.asarray(gf)[~np.asarray(valid)] == 0)

    def test_multi_chunk_loop(self):
        # tiny target_elems forces several scan chunks in fwd and bwd
        feats, nbr, w, valid, cot = self._setup(3, 6, 5, seed=25)

        def loss_custom(f, wt):
            return (SC.subm_conv(f, nbr, wt, valid,
                                 target_elems=4096) * cot).sum()

        def loss_auto(f, wt):
            return (SC._subm_conv_impl(f, nbr, wt, valid,
                                       target_elems=4096) * cot).sum()

        gf_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
        gf_a, gw_a = jax.grad(loss_auto, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_a),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_a),
                                   rtol=2e-4, atol=2e-4)
