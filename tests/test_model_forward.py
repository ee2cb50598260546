"""End-to-end model forward tests: train loss + eval post-processing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdino3d_tpu.gtypes import SceneBatch
from segdino3d_tpu.models.architecture.segdino3d import SegDINO3D
from segdino3d_tpu.models.architecture.postprocess import (
    predict_instance, predict_semantic, predict_panoptic)
from segdino3d_tpu.models.backbone.res16unet import Res16UNet34C
from segdino3d_tpu.models.backbone.wrapper import SparseBackboneWrapper
from segdino3d_tpu.models.decoder.query_decoder import ScanNetQueryDecoder
from segdino3d_tpu.models.criterion.losses import ScanNetUnifiedCriterion

N_CLS = 6          # instance classes
N_SEM = 8          # semantic classes


def tiny_model(voxel_size=0.08, s_cap=24):
    unet = Res16UNet34C(in_channels=3 + 8, out_channels=96,
                        config=dict(bn_momentum=0.02, conv1_kernel_size=5))
    backbone = SparseBackboneWrapper(unet=unet, voxel_size=voxel_size,
                                     s_cap=s_cap)
    decoder = ScanNetQueryDecoder(
        num_layers=2, num_instance_classes=N_CLS, num_semantic_classes=N_SEM,
        in_channels=96, d_model=64, num_heads=4, hidden_dim=128)
    return SegDINO3D(backbone=backbone, decoder=decoder, num_classes=N_CLS,
                     voxel_size=voxel_size)


def tiny_batch(b=2, p=200, s=24, k=5, i_cap=4, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, p, 6), np.float32)
    pts[..., :3] = rng.uniform(0, 2.0, (b, p, 3))
    pts[..., 3:] = rng.randn(b, p, 3)
    valid = np.ones((b, p), bool)
    valid[:, -16:] = False
    sp = rng.randint(0, s, (b, p)).astype(np.int32)
    inst = rng.randint(-1, i_cap, (b, p)).astype(np.int32)
    sp_inst = np.zeros((b, i_cap, s), bool)
    for bb in range(b):
        for ii in range(i_cap):
            sp_inst[bb, ii] = rng.rand(s) > 0.7
    sem = np.zeros((b, N_SEM + 1, s), bool)
    for bb in range(b):
        col = rng.randint(0, N_SEM + 1, s)
        sem[bb, col, np.arange(s)] = True
    return SceneBatch(
        points=jnp.asarray(pts),
        point_valid=jnp.asarray(valid),
        superpoint_ids=jnp.asarray(sp),
        num_superpoints=jnp.full((b,), s, jnp.int32),
        points_2dfeats=jnp.asarray(rng.randn(b, p, 8).astype(np.float32)),
        query2d_feats=jnp.asarray(rng.randn(b, k, 64).astype(np.float32)),
        query2d_pos=jnp.asarray(rng.uniform(0, 2, (b, k, 3)).astype(np.float32)),
        query2d_valid=jnp.ones((b, k), bool),
        inst_labels=jnp.asarray(rng.randint(0, N_CLS, (b, i_cap)), jnp.int32),
        inst_valid=jnp.ones((b, i_cap), bool),
        point_inst_ids=jnp.asarray(inst),
        sp_inst_masks=jnp.asarray(sp_inst),
        sp_sem_masks=jnp.asarray(sem),
    )


CRIT_CFG = dict(
    num_semantic_classes=N_SEM,
    sem_criterion=dict(type="ScanNetSemanticCriterion",
                       ignore_index=N_SEM, loss_weight=0.5),
    inst_criterion=dict(
        type="InstanceCriterion",
        matcher=dict(type="SparseMatcher", costs=[
            dict(type="QueryClassificationCost", weight=0.5),
            dict(type="MaskBCECost", weight=1.0),
            dict(type="MaskDiceCost", weight=1.0),
            dict(type="CenterL1Cost", weight=0.5),
            dict(type="SizeL1Cost", weight=0.5)], topk=1),
        loss_weight=[0.5, 1.0, 1.0, 0.5, 0.5, 0.5],
        num_classes=N_CLS, non_object_weight=0.1,
        fix_dice_loss_weight=True, iter_matcher=True, fix_mean_loss=True))


class TestModelForward:
    @pytest.fixture(scope="class")
    def setup(self):
        model = tiny_model()
        batch = tiny_batch()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "queries": jax.random.PRNGKey(1)},
            batch, False)
        return model, batch, variables

    def test_eval_forward(self, setup):
        model, batch, variables = setup
        (outputs, gt) = model.apply(variables, batch, False)
        s = 24
        assert outputs["cls_preds"].shape == (2, s, N_CLS + 1)
        assert outputs["sem_preds"].shape == (2, s, N_SEM + 1)
        assert outputs["masks"].shape == (2, s, s)
        assert outputs["centers"].shape == (2, s, 3)
        assert outputs["sizes"].shape == (2, s, 3)
        assert len(outputs["aux_outputs"]) == 2
        assert np.isfinite(np.asarray(outputs["cls_preds"])).all()
        assert np.isfinite(np.asarray(outputs["masks"])).all()

    @pytest.mark.slow
    def test_train_loss_and_grads(self, setup):
        model, batch, variables = setup
        crit = ScanNetUnifiedCriterion(**CRIT_CFG)

        def loss_fn(params):
            (outputs, gt), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, True,
                rngs={"queries": jax.random.PRNGKey(7)},
                mutable=["batch_stats"])
            losses = crit(outputs, gt)
            return losses["seg_loss"] + losses["inst_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        norms = [float(jnp.abs(g).max()) for g in flat]
        assert all(np.isfinite(n) for n in norms)
        assert max(norms) > 0

    def test_postprocess(self, setup):
        model, batch, variables = setup
        (outputs, gt) = model.apply(variables, batch, False)
        test_cfg = dict(topk_insts=20, inst_score_thr=0.0, pan_score_thr=0.5,
                        npoint_thr=2, obj_normalization=True, sp_score_thr=0.4,
                        nms=True, matrix_nms_kernel="linear")
        b0 = 0
        inst = predict_instance(
            outputs["cls_preds"][b0], outputs["masks"][b0],
            outputs["query_valid"][b0], outputs["sp_valid"][b0],
            batch.superpoint_ids[b0], batch.point_valid[b0],
            batch.points[b0, :, :3], 0.0, test_cfg,
            centers=outputs["centers"][b0], sizes=outputs["sizes"][b0],
            filter_outofbox=True)
        assert inst.point_masks.shape == (20, 200)
        assert np.isfinite(np.asarray(inst.scores)).all()
        sem = predict_semantic(outputs["sem_preds"][b0],
                               batch.superpoint_ids[b0])
        assert sem.shape == (200,)
        sem_pan, inst_pan = predict_panoptic(
            outputs["sem_preds"][b0], inst, batch.superpoint_ids[b0],
            n_stuff_classes=2, npoint_thr=2)
        assert sem_pan.shape == (200,) and inst_pan.shape == (200,)


class TestThresholdDerivation:
    @pytest.fixture(scope="class")
    def setup(self):
        model = tiny_model()
        batch = tiny_batch()
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "queries": jax.random.PRNGKey(1)},
            batch, False)
        return model, batch, variables

    @pytest.mark.slow
    def test_derived_filter_matches_direct_run(self, setup):
        """The eval driver derives the panoptic-threshold instance set from
        one base predict_instance run (evaluate.make_predict_fn); that must
        equal running predict_instance directly at the higher threshold."""
        model, batch, variables = setup
        outputs, _ = model.apply(variables, batch, False)
        test_cfg = dict(topk_insts=20, inst_score_thr=0.0, pan_score_thr=0.5,
                        npoint_thr=2, obj_normalization=True,
                        sp_score_thr=0.4, nms=True,
                        matrix_nms_kernel="linear")
        b0 = 0
        args = (outputs["cls_preds"][b0], outputs["masks"][b0],
                outputs["query_valid"][b0], outputs["sp_valid"][b0],
                batch.superpoint_ids[b0], batch.point_valid[b0],
                batch.points[b0, :, :3])
        kw = dict(centers=outputs["centers"][b0], sizes=outputs["sizes"][b0],
                  filter_outofbox=True)
        for thr in (0.3, 0.5):
            direct = predict_instance(*args, thr, test_cfg, **kw)
            base = predict_instance(*args, 0.0, test_cfg, **kw)
            valid = base.valid & (base.scores > thr)
            derived = base._replace(
                valid=valid, scores=jnp.where(valid, base.scores, 0.0))
            np.testing.assert_array_equal(np.asarray(direct.valid),
                                          np.asarray(derived.valid))
            np.testing.assert_allclose(np.asarray(direct.scores),
                                       np.asarray(derived.scores))
            np.testing.assert_array_equal(np.asarray(direct.point_masks),
                                          np.asarray(derived.point_masks))
            np.testing.assert_array_equal(np.asarray(direct.labels),
                                          np.asarray(derived.labels))


class TestDecoderBf16:
    @pytest.mark.slow
    def test_bf16_decoder_close_to_f32(self):
        """decoder compute_dtype="bfloat16" must track the f32 outputs
        within bf16 tolerance (params f32; LN / softmax / heads stay f32
        by design, so the drift is bounded by the projection matmuls)."""
        import dataclasses

        model = tiny_model()
        batch = tiny_batch()
        rngs = {"params": jax.random.PRNGKey(0),
                "queries": jax.random.PRNGKey(1)}
        variables = model.init(rngs, batch, False)

        dec_bf = dataclasses.replace(model.decoder,
                                     compute_dtype="bfloat16")
        model_bf = dataclasses.replace(model, decoder=dec_bf)

        out32, _ = model.apply(variables, batch, False)
        outbf, _ = model_bf.apply(variables, batch, False)
        # class logits: moderate tolerance; relative on the logit scale
        a = np.asarray(out32["cls_preds"], np.float32)
        b = np.asarray(outbf["cls_preds"], np.float32)
        scale = np.maximum(np.abs(a).max(), 1.0)
        assert np.max(np.abs(a - b)) / scale < 0.05
        m = np.asarray(out32["masks"], np.float32)
        mb = np.asarray(outbf["masks"], np.float32)
        mscale = np.maximum(np.abs(m).max(), 1.0)
        assert np.max(np.abs(m - mb)) / mscale < 0.05
