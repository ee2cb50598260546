"""Smoke + behavior tests for the Res16UNet backbone wrapper."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdino3d_tpu.gtypes import SceneBatch
from segdino3d_tpu.models.backbone.res16unet import Res16UNet34C
from segdino3d_tpu.models.backbone.wrapper import SparseBackboneWrapper


def make_batch(b=2, p=256, s=16, k=4, c2d=8, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, p, 6), np.float32)
    pts[..., :3] = rng.uniform(0, 2.0, (b, p, 3))
    pts[..., 3:] = rng.randn(b, p, 3)
    valid = np.ones((b, p), bool)
    valid[:, -20:] = False
    sp = rng.randint(0, s, (b, p)).astype(np.int32)
    return SceneBatch(
        points=jnp.asarray(pts),
        point_valid=jnp.asarray(valid),
        superpoint_ids=jnp.asarray(sp),
        num_superpoints=jnp.full((b,), s, jnp.int32),
        points_2dfeats=jnp.asarray(rng.randn(b, p, c2d).astype(np.float32)),
    )


def make_wrapper(voxel_size=0.08, s_cap=16):
    unet = Res16UNet34C(in_channels=3 + 8, out_channels=96,
                        config=dict(bn_momentum=0.02, conv1_kernel_size=5))
    return SparseBackboneWrapper(unet=unet, voxel_size=voxel_size, s_cap=s_cap)


class TestBackbone:
    @pytest.mark.slow
    def test_forward_shapes_and_masks(self):
        batch = make_batch()
        bb = make_wrapper()
        variables = bb.init(jax.random.PRNGKey(0), batch, False)
        out = bb.apply(variables, batch, False)
        assert out.sp_feats.shape == (2, 16, 96)
        assert out.sp_pos.shape == (2, 16, 3)
        assert np.isfinite(np.asarray(out.sp_feats)).all()
        assert np.abs(np.asarray(out.sp_feats)).max() > 0

    @pytest.mark.slow
    def test_translation_invariance_of_conv(self):
        """Shifting a scene by a multiple of 16 voxels must not change
        features (lattice translation equivariance of the whole U-Net)."""
        batch = make_batch(b=1, p=128, s=8)
        bb = make_wrapper(s_cap=8)
        variables = bb.init(jax.random.PRNGKey(0), batch, False)
        out1 = bb.apply(variables, batch, False)
        shifted = batch.replace(points=batch.points.at[..., :3].add(16 * 0.08))
        out2 = bb.apply(variables, shifted, False)
        np.testing.assert_allclose(np.asarray(out1.sp_feats),
                                   np.asarray(out2.sp_feats), atol=2e-4)


def test_bf16_compute_has_no_f32_leak():
    """Regression: flax Dense promotion (bf16 x f32 kernel -> f32) in the
    BasicBlock residual projection used to flip every layer from block2
    onward back to f32 under bf16 compute — found by per-fusion trace
    attribution on the real chip. Assert every unet intermediate matrix
    stays bf16 (BN/stat internals excepted by the ndim>=2 matrix
    filter)."""
    from flax.traverse_util import flatten_dict

    batch = make_batch()
    unet = Res16UNet34C(in_channels=3 + 8, out_channels=96,
                        config=dict(bn_momentum=0.02, conv1_kernel_size=5))
    bb = SparseBackboneWrapper(unet=unet, voxel_size=0.08, s_cap=16,
                               compute_dtype="bfloat16")
    variables = bb.init(jax.random.PRNGKey(0), batch, False)
    _, st = bb.apply(variables, batch, False,
                     capture_intermediates=lambda mdl, name: True,
                     mutable=["intermediates"])
    bad = []
    for k, v in flatten_dict(st["intermediates"]).items():
        if "unet" not in k:
            continue
        for x in jax.tree.leaves(v):
            if (hasattr(x, "dtype") and x.ndim >= 2
                    and x.dtype == jnp.float32):
                bad.append(("/".join(k), x.shape))
    assert not bad, f"f32 leaked into the bf16 unet: {bad[:5]}"
