"""Unit tests for coordinate keys, voxelization, segment ops, kernel maps."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdino3d_tpu.ops import keys as K
from segdino3d_tpu.ops import scatter
from segdino3d_tpu.ops import sparse_conv as SC
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
        # every coordinate must be found at its sorted position
        found = K.lookup_coords(s_hi, s_lo, hi, lo)
        assert (np.asarray(found) >= 0).all()
        np.testing.assert_array_equal(np.asarray(s_idx)[np.asarray(found)], np.arange(n))

    def test_lookup_missing(self):
        coords = jnp.asarray([[0, 1, 1, 1], [0, 2, 2, 2]], jnp.int32)
        valid = jnp.ones(2, bool)
        hi, lo = K.pack_coords(coords, valid)
        s_hi, s_lo = K.lexsort_keys(hi, lo)
        q = jnp.asarray([[0, 1, 1, 1], [0, 3, 3, 3], [1, 1, 1, 1]], jnp.int32)
        q_hi, q_lo = K.pack_coords(q, jnp.ones(3, bool))
        res = np.asarray(K.lookup_coords(s_hi, s_lo, q_hi, q_lo))
        assert res[0] >= 0 and res[1] == -1 and res[2] == -1

    def test_sentinel_never_matches(self):
        coords = jnp.asarray([[0, 1, 1, 1]], jnp.int32)
        hi, lo = K.pack_coords(coords, jnp.ones(1, bool))
        s_hi, s_lo = K.lexsort_keys(
            jnp.concatenate([hi, jnp.full((3,), K.INT32_MAX)]),
            jnp.concatenate([lo, jnp.full((3,), K.INT32_MAX)]))
        q_hi, q_lo = K.pack_coords(coords, jnp.zeros(1, bool))  # invalid query
        assert np.asarray(K.lookup_coords(s_hi, s_lo, q_hi, q_lo))[0] == -1


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

        # numpy reference
        ijk = np.floor(pts / voxel_size).astype(np.int64)
        key = (b.astype(np.int64) << 48) | (ijk[:, 0] << 32) | (ijk[:, 1] << 16) | ijk[:, 2]
        key = key[valid]
        uniq, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        assert int(grid.num_voxels) == len(uniq)
        assert not bool(grid.overflow)

        ref_feats = np.zeros((len(uniq), 4), np.float32)
        np.add.at(ref_feats, inv, feats[valid])
        ref_feats /= cnt[:, None]

        got = np.asarray(grid.feats)[: len(uniq)]
        # grid voxels are key-sorted; uniq is sorted by the same key order
        np.testing.assert_allclose(got, ref_feats, rtol=1e-5, atol=1e-5)

        # inverse mapping round trip: voxel coord of each valid point matches
        inv_map = np.asarray(grid.inverse_mapping)[valid]
        np.testing.assert_array_equal(inv_map, inv)

        # devoxelize: each point receives its voxel's feature
        pt_feats = devoxelize(grid.feats, grid.inverse_mapping, jnp.asarray(valid))
        np.testing.assert_allclose(np.asarray(pt_feats)[valid], ref_feats[inv], rtol=1e-5)

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


class TestConvPlan:
    def _tiny_grid(self, coords):
        coords = np.asarray(coords, np.int32)
        n = coords.shape[0]
        valid = jnp.ones(n, bool)
        hi, lo = K.pack_coords(jnp.asarray(coords), valid)
        s_hi, s_lo, order = K.lexsort_keys(hi, lo, jnp.arange(n, dtype=jnp.int32))
        sorted_coords = jnp.asarray(coords)[order]
        from segdino3d_tpu.ops.voxelize import VoxelGrid
        return VoxelGrid(
            coords=sorted_coords, feats=jnp.zeros((n, 1)), valid=valid,
            key_hi=s_hi, key_lo=s_lo, num_voxels=jnp.asarray(n),
            inverse_mapping=jnp.zeros(n, jnp.int32), overflow=jnp.asarray(False))

    def test_downsample_unique(self):
        # 8 voxels forming one 2x2x2 block + 1 lone voxel
        block = [[0, x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)]
        coords = block + [[0, 4, 4, 4]]
        grid = self._tiny_grid(coords)
        plan = SC.build_conv_plan(grid, num_levels=2)
        lvl1 = plan.levels[1]
        assert int(lvl1.num_voxels) == 2
        got = np.asarray(lvl1.coords)[np.asarray(lvl1.valid)]
        np.testing.assert_array_equal(
            np.sort(got, axis=0), [[0, 0, 0, 0], [0, 2, 2, 2]])
        # parent links: the 8 block voxels map to the same coarse voxel
        lvl0 = plan.levels[0]
        parents = np.asarray(lvl0.parent_idx)
        coords0 = np.asarray(lvl0.coords)
        in_block = (coords0[:, 1] < 2)
        assert len(set(parents[in_block])) == 1
        assert len(set(parents[~in_block])) == 1
        kpos = np.asarray(lvl0.parent_kpos)[in_block]
        assert sorted(kpos) == list(range(8))

    def test_subm_conv_center_only(self):
        # identity kernel (only center offset nonzero) == per-voxel linear
        coords = _rand_coords(64, extent=10, batch=1, seed=3)
        coords = np.unique(coords, axis=0)
        grid = self._tiny_grid(coords)
        n = coords.shape[0]
        offsets = SC.kernel_offsets(3)
        nbr = SC._neighbor_table(grid.key_hi, grid.key_lo, grid.coords,
                                 grid.valid, offsets)
        # center offset must map to self
        center = 13
        np.testing.assert_array_equal(np.asarray(nbr[:, center]), np.arange(n))

        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(n, 4).astype(np.float32))
        w = np.zeros((27, 4, 5), np.float32)
        w[center] = rng.randn(4, 5)
        out = SC.subm_conv(feats, nbr, jnp.asarray(w), grid.valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(feats) @ w[center],
                                   rtol=1e-5, atol=1e-5)

    def test_subm_conv_dense_parity(self):
        # compare against a dense 3D conv on a small dense-ified grid
        rng = np.random.RandomState(7)
        ext = 6
        coords = np.unique(_rand_coords(120, extent=ext, batch=1, seed=9), axis=0)
        n = coords.shape[0]
        grid = self._tiny_grid(coords)
        feats = rng.randn(n, 3).astype(np.float32)
        w = rng.randn(27, 3, 2).astype(np.float32)

        offsets = SC.kernel_offsets(3)
        nbr = SC._neighbor_table(grid.key_hi, grid.key_lo, grid.coords,
                                 grid.valid, offsets)
        out = np.asarray(SC.subm_conv(jnp.asarray(feats), nbr, jnp.asarray(w),
                                      grid.valid))

        # dense reference: scatter to grid, correlate, read at coords
        sc = np.asarray(grid.coords)
        dense = np.zeros((ext + 4, ext + 4, ext + 4, 3), np.float32)
        dense[sc[:, 1] + 2, sc[:, 2] + 2, sc[:, 3] + 2] = feats
        for i in range(n):
            x, y, z = sc[i, 1] + 2, sc[i, 2] + 2, sc[i, 3] + 2
            ref = np.zeros(2, np.float32)
            for oi, (dx, dy, dz) in enumerate(offsets):
                # only existing voxels contribute (submanifold!)
                nb = sc[i, 1:] + np.array([dx, dy, dz])
                exists = ((sc[:, 1:] == nb).all(1)).any()
                if exists:
                    ref += dense[x + dx, y + dy, z + dz] @ w[oi]
            np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)

    def test_down_up_conv_roundtrip_shapes(self):
        coords = np.unique(_rand_coords(200, extent=16, batch=2, seed=5), axis=0)
        grid = self._tiny_grid(coords)
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
        # one 2x2x2 block with 2 voxels -> single coarse voxel sums W[k] x
        coords = [[0, 0, 0, 0], [0, 1, 0, 1]]
        grid = self._tiny_grid(coords)
        plan = SC.build_conv_plan(grid, num_levels=2)
        lvl0, lvl1 = plan.levels
        feats = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        w = np.zeros((8, 2, 2), np.float32)
        for o in range(8):
            w[o] = np.eye(2) * (o + 1)
        out = np.asarray(SC.down_conv(feats, lvl0, lvl1, jnp.asarray(w)))
        # voxel (0,0,0) has kpos 0 -> W[0]=I*1 ; voxel (1,0,1) kpos = 4+0+1=5 -> I*6
        np.testing.assert_allclose(out[0], [1.0, 6.0])
        # up conv: each fine voxel receives W[kpos]^T路coarse
        wu = jnp.asarray(np.stack([np.eye(2, dtype=np.float32) * (o + 1) for o in range(8)]))
        up = np.asarray(SC.up_conv(jnp.asarray(out), lvl0, wu))
        srt = np.asarray(lvl0.coords)
        i000 = int(np.where((srt[:, 1:] == [0, 0, 0]).all(1))[0][0])
        i101 = int(np.where((srt[:, 1:] == [1, 0, 1]).all(1))[0][0])
        np.testing.assert_allclose(up[i000], [1.0, 6.0])
        np.testing.assert_allclose(up[i101], [6.0, 36.0])
