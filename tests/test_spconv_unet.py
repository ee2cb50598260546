"""SpConvUNet (ScanNet v2 family) smoke + behavior tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdino3d_tpu.gtypes import SceneBatch
from segdino3d_tpu.models.backbone.spconv_unet import SpConvUNet
from segdino3d_tpu.models.backbone.wrapper import SparseBackboneWrapper


def make_batch(b=1, p=300, s=12, c2d=8, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, p, 6), np.float32)
    pts[..., :3] = rng.uniform(0, 2.0, (b, p, 3))
    pts[..., 3:] = rng.randn(b, p, 3)
    sp = rng.randint(0, s, (b, p)).astype(np.int32)
    return SceneBatch(
        points=jnp.asarray(pts),
        point_valid=jnp.ones((b, p), bool),
        superpoint_ids=jnp.asarray(sp),
        num_superpoints=jnp.full((b,), s, jnp.int32),
        points_2dfeats=jnp.asarray(rng.randn(b, p, c2d).astype(np.float32)),
    )


@pytest.mark.slow
def test_spconv_unet_forward():
    batch = make_batch()
    unet = SpConvUNet(num_planes=(16, 24, 32, 40, 48), block_reps=2,
                      in_channels=3 + 3 + 8)
    bb = SparseBackboneWrapper(unet=unet, voxel_size=0.08, s_cap=12,
                               stem_kernel=3, include_centered_xyz=True,
                               level_cap_ratios=(1, 1, 1, 1, 1))
    variables = bb.init(jax.random.PRNGKey(0), batch, False)
    out = bb.apply(variables, batch, False)
    # output channels = num_planes[0]
    assert out.sp_feats.shape == (1, 12, 16)
    assert np.isfinite(np.asarray(out.sp_feats)).all()
    assert np.abs(np.asarray(out.sp_feats)).max() > 0


@pytest.mark.slow
def test_spconv_unet_gradients():
    batch = make_batch(p=200)
    unet = SpConvUNet(num_planes=(8, 12, 16), block_reps=1,
                      in_channels=3 + 3 + 8)
    bb = SparseBackboneWrapper(unet=unet, voxel_size=0.1, s_cap=12,
                               stem_kernel=3, include_centered_xyz=True,
                               level_cap_ratios=(1, 1, 1))
    # only 3 planes -> need a 3-level plan: wrapper builds 5 by default;
    # SpConvUNet asserts len(levels) >= len(planes), so 5 levels are fine
    bb = SparseBackboneWrapper(unet=unet, voxel_size=0.1, s_cap=12,
                               stem_kernel=3, include_centered_xyz=True,
                               level_cap_ratios=(1, 1, 1, 1, 1))
    variables = bb.init(jax.random.PRNGKey(0), batch, False)

    def loss(params):
        out = bb.apply({"params": params,
                        "batch_stats": variables["batch_stats"]},
                       batch, False)
        return jnp.sum(out.sp_feats ** 2)

    g = jax.grad(loss)(variables["params"])
    norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0
