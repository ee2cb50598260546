"""Eval post-processing parity against the *executed* reference code.

The reference's single-scene predict path (``/root/reference/segdino3d/
models/architecture/baseline3d.py:373-556`` + ``mask_matrix_nms`` :22-141)
is imported via ``tests/reference_import.py`` and run on random inputs; our
static-shape vmap-able pipeline (``models/architecture/postprocess.py``)
must produce the identical surviving instance set (scores, labels, point
masks, boxes), the identical semantic map, and a panoptic map equal up to
instance-id bijection, across top-k -> objectness renorm -> matrix-NMS ->
superpoint unpool -> score/npoint thresholds -> out-of-box filtering ->
panoptic merge.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")

from reference_import import load_reference_modules

REF = load_reference_modules()

from segdino3d_tpu.models.architecture.postprocess import (
    predict_instance, predict_panoptic, predict_semantic)
from segdino3d_tpu.ops.nms import mask_matrix_nms


class AttrCfg(dict):
    """dict with attribute access, like the reference's mmengine cfg."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _ref_model(num_classes, test_cfg, filter_box):
    m = object.__new__(REF["baseline3d"].Baseline3D)
    m.num_classes = num_classes
    m.test_cfg = test_cfg
    m.filter_outofbox_points_eval = filter_box
    m.query_num = -1
    return m


def _scene(seed, n_q=40, n_cls=8, n_sp=64, n_pts=400, n_sem=10):
    rng = np.random.RandomState(seed)
    return dict(
        cls=rng.randn(n_q, n_cls + 1).astype(np.float32),
        mask=(rng.randn(n_q, n_sp) * 2).astype(np.float32),
        sem=rng.randn(n_sp, n_sem + 1).astype(np.float32),
        ctr=rng.randn(n_q, 3).astype(np.float32),
        sz=np.abs(rng.randn(n_q, 3)).astype(np.float32) + 0.5,
        sp_ids=rng.randint(0, n_sp, n_pts).astype(np.int32),
        pts=(rng.randn(n_pts, 3) * 1.5).astype(np.float32),
        n_q=n_q, n_cls=n_cls, n_sp=n_sp, n_pts=n_pts, n_sem=n_sem,
    )


TEST_CFG = dict(topk_insts=50, sp_score_thr=0.4, npoint_thr=3, nms=True,
                matrix_nms_kernel="linear", obj_normalization=True,
                inst_score_thr=0.05, pan_score_thr=0.10,
                stuff_classes=[0, 1])


def _run_ref(sc, score_thr, filter_box):
    t = torch.as_tensor
    m = _ref_model(sc["n_cls"], AttrCfg(TEST_CFG), filter_box)
    out = dict(cls_preds=[t(sc["cls"])], masks=[t(sc["mask"])],
               scores=[None], centers=[t(sc["ctr"])], sizes=[t(sc["sz"])],
               sem_preds=[t(sc["sem"])])
    samples = [t(sc["pts"])]
    sp = t(sc["sp_ids"]).long()
    return m, out, samples, sp


def _run_ours(sc, score_thr, filter_box):
    return predict_instance(
        jnp.asarray(sc["cls"]), jnp.asarray(sc["mask"]),
        jnp.ones((sc["n_q"],), bool), jnp.ones((sc["n_sp"],), bool),
        jnp.asarray(sc["sp_ids"]), jnp.ones((sc["n_pts"],), bool),
        jnp.asarray(sc["pts"]), score_thr, TEST_CFG,
        centers=jnp.asarray(sc["ctr"]), sizes=jnp.asarray(sc["sz"]),
        filter_outofbox=filter_box)


class TestInstanceParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("filter_box", [True, False])
    def test_surviving_instances_match_reference(self, seed, filter_box):
        sc = _scene(seed)
        thr = TEST_CFG["inst_score_thr"]
        m, out, samples, sp = _run_ref(sc, thr, filter_box)
        ref_mask, ref_lab, ref_sc, _, ref_box = m.predict_by_feat_instance(
            samples, out, sp, thr)

        r = _run_ours(sc, thr, filter_box)
        keep = np.asarray(r.valid)
        o_sc = np.asarray(r.scores)[keep]
        o_lab = np.asarray(r.labels)[keep]
        o_mask = np.asarray(r.point_masks)[keep]
        o_box = np.asarray(r.boxes)[keep]

        assert o_sc.shape[0] == ref_sc.shape[0] > 0
        # reference output is decay-score sorted; sort ours the same way
        order = np.argsort(-o_sc, kind="stable")
        np.testing.assert_allclose(o_sc[order], ref_sc.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(o_lab[order], ref_lab.numpy())
        np.testing.assert_array_equal(o_mask[order], ref_mask.numpy())
        np.testing.assert_allclose(o_box[order], ref_box.numpy(),
                                   rtol=1e-5, atol=1e-6)


class TestMatrixNMSParity:
    @pytest.mark.parametrize("kernel", ["linear", "gaussian"])
    def test_decayed_scores_match_reference(self, kernel):
        rng = np.random.RandomState(7)
        n, s = 60, 48
        masks = rng.rand(n, s).astype(np.float32)
        labels = rng.randint(0, 5, n).astype(np.int64)
        scores = rng.rand(n).astype(np.float32)
        ref_sc, ref_lab, _, _, _ = REF["baseline3d"].mask_matrix_nms(
            torch.as_tensor(masks), torch.as_tensor(labels),
            torch.as_tensor(scores), kernel=kernel)
        new_sc, order = mask_matrix_nms(
            jnp.asarray(masks), jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(scores), kernel=kernel)
        ours_sorted = np.asarray(new_sc)[np.asarray(order)]
        np.testing.assert_allclose(ours_sorted, ref_sc.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(labels)[np.asarray(order)], ref_lab.numpy())


class TestSemanticPanopticParity:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_semantic_map_matches_reference(self, seed):
        sc = _scene(seed)
        m, out, samples, sp = _run_ref(sc, 0.0, False)
        ref_sem = m.predict_by_feat_semantic(out, sp)
        ours = predict_semantic(jnp.asarray(sc["sem"]),
                                jnp.asarray(sc["sp_ids"]))
        np.testing.assert_array_equal(np.asarray(ours), ref_sem.numpy())

    @pytest.mark.parametrize("seed", [0, 4])
    def test_panoptic_maps_match_reference(self, seed):
        sc = _scene(seed)
        m, out, samples, sp = _run_ref(sc, 0.0, False)
        ref_sem, ref_inst = m.predict_by_feat_panoptic(samples, out, sp)
        ref_sem, ref_inst = ref_sem.numpy(), ref_inst.numpy()

        inst = _run_ours(sc, TEST_CFG["pan_score_thr"], False)
        o_sem, o_inst = predict_panoptic(
            jnp.asarray(sc["sem"]), inst, jnp.asarray(sc["sp_ids"]),
            n_stuff_classes=len(TEST_CFG["stuff_classes"]),
            npoint_thr=TEST_CFG["npoint_thr"])
        o_sem, o_inst = np.asarray(o_sem), np.asarray(o_inst)

        np.testing.assert_array_equal(o_sem, ref_sem)
        # instance ids depend on slot numbering: require a bijection
        pairs = set(zip(o_inst.tolist(), ref_inst.tolist()))
        assert len({a for a, _ in pairs}) == len(pairs)
        assert len({b for _, b in pairs}) == len(pairs)
        # stuff points (id < n_stuff in the reference) must agree exactly
        stuff = ref_inst < len(TEST_CFG["stuff_classes"])
        np.testing.assert_array_equal(o_inst[stuff], ref_inst[stuff])


class TestTransformParity:
    def test_elastic_matches_reference(self):
        """Our two-scale elastic (shared noise reused for query2d_pos)
        must reproduce the executed reference ElasticTransfrom exactly
        when fed the same RNG stream (same draw order: one rand() gate,
        then 3x randn per scale)."""
        from segdino3d_tpu.data.transforms import ElasticTransform

        rng0 = np.random.RandomState(31)
        pts = np.hstack([rng0.rand(500, 3).astype(np.float32) * 4 - 2,
                         rng0.randint(0, 255, (500, 3)).astype(np.float32)])
        q2d = (rng0.rand(9, 3) * 4 - 2).astype(np.float32)

        RefElastic = REF["pc_transforms"].ElasticTransfrom
        ref_t = {"extra_features": {"query2d_pos": torch.as_tensor(q2d)}}
        np.random.seed(77)
        _, ref_out = RefElastic(gran=(6, 20), mag=(40, 160),
                                voxel_size=0.02, p=1.0)(
            torch.as_tensor(pts.copy()), ref_t)

        ours_t = {"extra_features": {"query2d_pos": q2d.copy()}}
        _, out = ElasticTransform(gran=(6, 20), mag=(40, 160),
                                  voxel_size=0.02, p=1.0)(
            pts.copy(), ours_t, np.random.RandomState(77))

        np.testing.assert_allclose(
            np.asarray(out["elastic_coords"]),
            ref_out["elastic_coords"].numpy(), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["extra_features"]["elastic_coords_query2d_pos"]),
            ref_out["extra_features"]["elastic_coords_query2d_pos"].numpy(),
            rtol=1e-5, atol=1e-4)

    def test_color_normalize_matches_reference(self):
        from segdino3d_tpu.data.transforms import (NormalizePointsColor,
                                                   SCANNET_COLOR_MEAN,
                                                   SCANNET_COLOR_STD)

        rng = np.random.RandomState(5)
        pts = np.hstack([rng.rand(64, 3).astype(np.float32),
                         rng.randint(0, 255, (64, 3)).astype(np.float32)])
        RefNorm = REF["pc_transforms"].NormalizePointsColor
        ref_pts, _ = RefNorm(list(SCANNET_COLOR_MEAN),
                             list(SCANNET_COLOR_STD))(
            torch.as_tensor(pts.copy()), {})
        ours, _ = NormalizePointsColor(SCANNET_COLOR_MEAN,
                                       SCANNET_COLOR_STD)(
            pts.copy(), {}, rng)
        np.testing.assert_allclose(ours[:, 3:6], ref_pts.numpy()[:, 3:6],
                                   rtol=1e-6, atol=1e-6)


class TestGtBoxParity:
    """GT instance centers/sizes + scene range vs the executed reference
    ``get_extra_instance_data`` (baseline3d.py:266-306), both center
    modes, with and without elastic coords, including an empty
    instance (stays zeros) and ragged scenes under our padding."""

    @pytest.mark.parametrize("mode", ["median", "mean"])
    @pytest.mark.parametrize("elastic", [False, True])
    def test_centers_sizes_range(self, mode, elastic):
        from types import SimpleNamespace

        from segdino3d_tpu.gtypes import SceneBatch
        from segdino3d_tpu.models.architecture.segdino3d import \
            compute_scene_range_and_boxes

        rng = np.random.RandomState(13)
        voxel = 0.02
        n_pts, n_inst = [300, 240], [5, 3]
        P, I = 320, 6
        t = torch.as_tensor

        m = object.__new__(REF["baseline3d"].Baseline3D)
        m.backbone = SimpleNamespace(voxel_size=voxel)
        m.mode_3d_center = mode

        class Tgt(dict):
            def __setattr__(self, k, v):
                self[k] = v

            def __getattr__(self, k):
                return self[k]

        samples, targets = [], []
        pts_pad = np.zeros((2, P, 6), np.float32)
        ids_pad = np.full((2, P), -1, np.int32)
        el_pad = np.zeros((2, P, 3), np.float32)
        pvalid = np.zeros((2, P), bool)
        for j in range(2):
            pts = (rng.rand(n_pts[j], 6) * 3).astype(np.float32)
            ids = rng.randint(-1, n_inst[j], n_pts[j])
            ids[ids == n_inst[j] - 1] = -1      # last instance empty
            el = (rng.rand(n_pts[j], 3) * 100).astype(np.float32)
            masks = np.stack([(ids == k) for k in range(n_inst[j])])
            tg = Tgt()
            tg["masks"] = t(masks)[..., None]
            if elastic:
                tg["elastic_coords"] = t(el)
            samples.append(t(pts))
            targets.append(tg)
            pts_pad[j, :n_pts[j]] = pts
            ids_pad[j, :n_pts[j]] = ids
            el_pad[j, :n_pts[j]] = el
            pvalid[j, :n_pts[j]] = True

        srange = m.get_extra_instance_data(
            samples, targets, add_instance_centers=True,
            add_instance_axis_aligned_box=True)

        batch = SceneBatch(
            points=jnp.asarray(pts_pad), point_valid=jnp.asarray(pvalid),
            superpoint_ids=jnp.zeros((2, P), jnp.int32),
            num_superpoints=jnp.ones((2,), jnp.int32),
            elastic_coords=jnp.asarray(el_pad) if elastic else None,
            inst_labels=jnp.zeros((2, I), jnp.int32),
            point_inst_ids=jnp.asarray(ids_pad))
        o_range, o_ctr, o_sz = compute_scene_range_and_boxes(
            batch, voxel, mode)

        for j in range(2):
            lo, hi = srange[j]
            np.testing.assert_allclose(np.asarray(o_range[j, 0]), lo.numpy(),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(o_range[j, 1]), hi.numpy(),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(o_ctr[j, :n_inst[j]]),
                targets[j]["instance_centers"].numpy(),
                rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(o_sz[j, :n_inst[j]]),
                targets[j]["instance_sizes"].numpy(),
                rtol=1e-5, atol=1e-5)


class TestPEParity:
    """Positional embeddings vs the executed reference
    PositionEmbeddingCoordsSine (utils.py:23-164) — sine (plain and
    box-modulated) and Gaussian-Fourier (sharing the reference's own
    gauss_B buffer)."""

    def test_sine_matches_executed_reference(self):
        from segdino3d_tpu.ops.pos_embed import sine_pos_embed

        rng = np.random.RandomState(3)
        xyz = rng.uniform(-2, 4, (2, 50, 3)).astype(np.float32)
        lo = xyz.min(1) - 0.2
        hi = xyz.max(1) + 0.2
        mod = rng.uniform(0.5, 2.0, (2, 50, 3)).astype(np.float32)
        pe = REF["utils"].PositionEmbeddingCoordsSine(
            temperature=20, normalize=True, pos_type="sine", d_pos=256)
        t = torch.as_tensor
        for m in (None, mod):
            ref = pe(t(xyz), num_channels=256,
                     input_range=(t(lo), t(hi)),
                     modulated=None if m is None else t(m))
            got = sine_pos_embed(
                jnp.asarray(xyz), 256,
                (jnp.asarray(lo), jnp.asarray(hi)), temperature=20.0,
                modulated=None if m is None else jnp.asarray(m))
            np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                       rtol=2e-4, atol=2e-4)

    def test_fourier_matches_executed_reference(self):
        from segdino3d_tpu.ops.pos_embed import fourier_pos_embed

        rng = np.random.RandomState(4)
        xyz = rng.uniform(-1, 3, (2, 40, 3)).astype(np.float32)
        lo = xyz.min(1) - 0.2
        hi = xyz.max(1) + 0.2
        torch.manual_seed(0)
        pe = REF["utils"].PositionEmbeddingCoordsSine(
            normalize=True, pos_type="fourier", d_pos=128, gauss_scale=1.0)
        t = torch.as_tensor
        ref = pe(t(xyz), num_channels=128, input_range=(t(lo), t(hi)))
        got = fourier_pos_embed(
            jnp.asarray(xyz), jnp.asarray(pe.gauss_B.numpy()), 128,
            (jnp.asarray(lo), jnp.asarray(hi)))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   rtol=2e-4, atol=2e-4)
