"""Smoke + behavior tests for the Res16UNet backbone and wrapper."""
import jax
import jax.numpy as jnp
import numpy as np

from segdino3d_tpu.gtypes import SceneBatch
from segdino3d_tpu.models.backbone.res16unet import Res16UNet34C
from segdino3d_tpu.models.backbone.wrapper import run_backbone


def make_batch(b=2, p=256, s=16, k=4, c2d=8, seed=0, with_gt=False, i_cap=5):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, p, 6), np.float32)
    pts[..., :3] = rng.uniform(0, 2.0, (b, p, 3))
    pts[..., 3:] = rng.randn(b, p, 3)
    valid = np.ones((b, p), bool)
    valid[:, -20:] = False
    sp = rng.randint(0, s, (b, p)).astype(np.int32)
    kwargs = {}
    if with_gt:
        inst = rng.randint(-1, i_cap, (b, p)).astype(np.int32)
        kwargs.update(
            inst_labels=jnp.asarray(rng.randint(0, 10, (b, i_cap)), jnp.int32),
            inst_valid=jnp.ones((b, i_cap), bool),
            point_inst_ids=jnp.asarray(inst),
            sp_inst_masks=jnp.asarray(rng.rand(b, i_cap, s) > 0.7),
            sp_sem_masks=jnp.asarray(rng.rand(b, 11, s) > 0.7),
        )
    return SceneBatch(
        points=jnp.asarray(pts),
        point_valid=jnp.asarray(valid),
        superpoint_ids=jnp.asarray(sp),
        num_superpoints=jnp.full((b,), s, jnp.int32),
        points_2dfeats=jnp.asarray(rng.randn(b, p, c2d).astype(np.float32)),
        query2d_feats=jnp.asarray(rng.randn(b, k, c2d).astype(np.float32)),
        query2d_pos=jnp.asarray(rng.uniform(0, 2, (b, k, 3)).astype(np.float32)),
        query2d_valid=jnp.ones((b, k), bool),
        **kwargs,
    )


class TestBackbone:
    def test_forward_shapes_and_masks(self):
        batch = make_batch()
        model = Res16UNet34C(in_channels=3 + 8, out_channels=96,
                             config=dict(bn_momentum=0.02, conv1_kernel_size=5))

        def init_and_run(batch):
            b, p = batch.points.shape[:2]
            # initialize with a tiny forward
            from segdino3d_tpu.ops.voxelize import voxelize
            from segdino3d_tpu.models.backbone.res16unet import build_unet_plan
            n = b * p
            bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
            coords = batch.points[..., :3].reshape(n, 3) / 0.08
            feats = jnp.concatenate(
                [batch.points[..., 3:].reshape(n, 3),
                 batch.points_2dfeats.reshape(n, -1)], -1)
            grid = voxelize(bidx, coords, feats, batch.point_valid.reshape(n))
            plan = build_unet_plan(grid, 5, 5)
            variables = model.init(jax.random.PRNGKey(0), grid.feats, plan, False)
            return variables

        variables = init_and_run(batch)
        out, updates, grid = run_backbone(
            model, variables, batch, voxel_size=0.08, s_cap=16, train=False)
        assert out.sp_feats.shape == (2, 16, 96)
        assert out.sp_pos.shape == (2, 16, 3)
        assert np.isfinite(np.asarray(out.sp_feats)).all()
        # at least some superpoint features should be nonzero
        assert np.abs(np.asarray(out.sp_feats)).max() > 0

    def test_translation_invariance_of_conv(self):
        """Shifting a scene by a multiple of 16 voxels must not change
        features (lattice translation equivariance of the whole U-Net)."""
        batch = make_batch(b=1, p=128, s=8)
        model = Res16UNet34C(in_channels=3 + 8, out_channels=96,
                             config=dict(bn_momentum=0.02, conv1_kernel_size=5))
        vs = 0.08
        out1, _, _ = _run(model, batch, vs)
        shifted = batch.replace(points=batch.points.at[..., :3].add(16 * vs))
        out2, _, _ = _run(model, shifted, vs)
        np.testing.assert_allclose(np.asarray(out1.sp_feats),
                                   np.asarray(out2.sp_feats), atol=2e-4)


def _run(model, batch, vs):
    b, p = batch.points.shape[:2]
    n = b * p
    from segdino3d_tpu.ops.voxelize import voxelize
    from segdino3d_tpu.models.backbone.res16unet import build_unet_plan
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
    coords = batch.points[..., :3].reshape(n, 3) / vs
    feats = jnp.concatenate(
        [batch.points[..., 3:].reshape(n, 3),
         batch.points_2dfeats.reshape(n, -1)], -1)
    grid = voxelize(bidx, coords, feats, batch.point_valid.reshape(n))
    plan = build_unet_plan(grid, 5, 5)
    variables = model.init(jax.random.PRNGKey(0), grid.feats, plan, False)
    out = run_backbone(model, variables, batch, voxel_size=vs,
                       s_cap=batch.sp_inst_masks.shape[2] if batch.sp_inst_masks is not None else 8,
                       train=False)
    return out
