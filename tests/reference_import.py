"""Import machinery for executing reference modules directly in tests.

The reference (`/root/reference`) depends on mmengine / plyfile / trimesh /
MinkowskiEngine / spconv, most of which are absent here.  The pure-torch
modules we test against numerically — ``models/loss/loss_3d.py``,
``models/module/attention.py``, ``models/decoder/instance_seg_3d_decoder.py``
and their utils — only *import* a thin slice of those deps, so tiny stubs
let us run the actual reference code (no re-derivation of its formulas)
and harvest its exact state-dict naming for the checkpoint bridge.

Usage::

    ref = load_reference_modules()   # None if torch/reference unavailable
    loss3d = ref["loss_3d"]
    dec = ref["decoder"]
"""
from __future__ import annotations

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference"


def _stub_mmengine(torch):
    mm = types.ModuleType("mmengine")

    class Registry:
        def __init__(self, name):
            self.name = name
            self.module_dict = {}

        def register_module(self, *a, **k):
            def deco(cls):
                self.module_dict[cls.__name__] = cls
                return cls
            return deco

        def get(self, name):
            return self.module_dict[name]

    def build_from_cfg(cfg, registry, default_args=None):
        cfg = dict(cfg)
        cls = registry.get(cfg.pop("type"))
        if default_args:
            cfg.update(default_args)
        return cls(**cfg)

    mm.Registry = Registry
    mm.build_from_cfg = build_from_cfg
    mm_model = types.ModuleType("mmengine.model")
    mm_model.BaseModule = torch.nn.Module
    mm.model = mm_model
    sys.modules["mmengine"] = mm
    sys.modules["mmengine.model"] = mm_model


def _stub_misc():
    for name, attrs in (("plyfile", ("PlyData", "PlyElement")),
                        ("trimesh", ())):
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        for a in attrs:
            setattr(mod, a, object)
        sys.modules[name] = mod


def _fake_segdino3d(torch):
    """A fake ``segdino3d`` package exposing no-op registries, so reference
    files' ``from segdino3d import LOSSES`` resolve without pulling in the
    ME/spconv-importing package ``__init__``."""
    import mmengine

    pkg = types.ModuleType("segdino3d")
    pkg.__path__ = [os.path.join(REF_ROOT, "segdino3d")]
    for reg in ("BACKBONES", "DECODERS", "LOSSES", "MATCHERS",
                "ARCHITECTURES", "POS_EMBEDDINGS", "PREPARERS", "DATASETS",
                "TRANSFORMS", "ENCODERS", "FUSERS", "NECKS", "TEXT_ENCODERS",
                "HEADS"):
        setattr(pkg, reg, mmengine.Registry(reg.lower()))
    pkg.build_loss = lambda cfg: mmengine.build_from_cfg(cfg, pkg.LOSSES)
    pkg.build_matcher = lambda cfg: mmengine.build_from_cfg(cfg, pkg.MATCHERS)
    for builder in ("build_backbone", "build_decoder", "build_text_encoder"):
        setattr(pkg, builder, lambda cfg: None)

    # identity transform that snapshots the dataset's pre-transform
    # ``results`` dict — the executable parity surface of __getitem__
    # (the real pipeline's preparer would reshape the target list after
    # this point; tests read ``captured_results`` instead)
    pkg.captured_results = []

    def build_transform(cfg):
        def recording_identity(results):
            pkg.captured_results.append(results)
            return results
        return recording_identity

    pkg.build_transform = build_transform
    sys.modules["segdino3d"] = pkg
    for sub in ("segdino3d.models", "segdino3d.models.module",
                "segdino3d.models.decoder", "segdino3d.models.loss",
                "segdino3d.models.architecture", "segdino3d.datasets",
                "segdino3d.datasets.dataset"):
        m = types.ModuleType(sub)
        m.__path__ = [os.path.join(REF_ROOT, *sub.split("."))]
        sys.modules[sub] = m
    return pkg


def _stub_dataset_deps(torch):
    """``scannet200.py`` needs PIL.Image/ImageFile (unused at runtime
    here) and ``torch_scatter.scatter_mean`` — the standard segment-mean
    contract, reproduced with torch.index_add."""
    if "PIL.Image" not in sys.modules:
        pil = sys.modules.setdefault("PIL", types.ModuleType("PIL"))
        img = types.ModuleType("PIL.Image")
        imf = types.ModuleType("PIL.ImageFile")
        imf.ImageFile = object
        pil.Image = img
        pil.ImageFile = imf
        sys.modules["PIL.Image"] = img
        sys.modules["PIL.ImageFile"] = imf
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")

        def scatter_mean(src, index, dim=0):
            assert dim == 0
            n = int(index.max()) + 1
            out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
            out.index_add_(0, index, src)
            cnt = torch.zeros(n, dtype=src.dtype).index_add_(
                0, index, torch.ones(len(index), dtype=src.dtype))
            cnt = cnt.clamp(min=1).view(-1, *([1] * (src.dim() - 1)))
            return out / cnt

        ts.scatter_mean = scatter_mean
        sys.modules["torch_scatter"] = ts


def _stub_mmdet3d():
    """``baseline3d.py`` imports ``mmdet3d.structures.PointData`` — a
    kwargs results container; a trivial stand-in suffices for executing
    the postproc methods.  ``utils_instance_seg_3d_eval.py`` additionally
    imports ``util_3d`` for ``get_instances``: the public ScanNet
    benchmark helper vendored by mmdet3d, whose whole contract is the
    ``1000 * semantic + instance`` id encoding the reference's own
    ``rename_gt`` produces (:484-491) — reproduced verbatim below."""
    if "mmdet3d" in sys.modules:
        return

    class PointData:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    import numpy as np

    def get_instances(mesh_vert_instances, class_ids, class_labels,
                      id2label):
        instances = {label: [] for label in class_labels}
        for iid in np.unique(mesh_vert_instances):
            if iid == 0:
                continue
            label_id = int(iid // 1000)
            if label_id in class_ids:
                instances[id2label[label_id]].append(dict(
                    instance_id=int(iid), label_id=label_id,
                    vert_count=int(
                        np.count_nonzero(mesh_vert_instances == iid)),
                    med_dist=-1, dist_conf=0.0))
        return instances

    mod = types.ModuleType("mmdet3d")
    structures = types.ModuleType("mmdet3d.structures")
    structures.PointData = PointData
    mod.structures = structures
    sys.modules["mmdet3d"] = mod
    sys.modules["mmdet3d.structures"] = structures
    util_3d = types.ModuleType(
        "mmdet3d.evaluation.functional.scannet_utils.util_3d")
    util_3d.get_instances = get_instances
    parent = "mmdet3d.evaluation.functional.scannet_utils"
    for name in ("mmdet3d.evaluation", "mmdet3d.evaluation.functional",
                 parent):
        sys.modules.setdefault(name, types.ModuleType(name))
    setattr(sys.modules[parent], "util_3d", util_3d)
    sys.modules[f"{parent}.util_3d"] = util_3d

    # terminaltables / mmengine.logging: report-formatting only
    if "terminaltables" not in sys.modules:
        tt = types.ModuleType("terminaltables")

        class AsciiTable:
            def __init__(self, rows):
                self.rows = rows
                self.inner_footing_row_border = False

            @property
            def table(self):
                return "\n".join("  ".join(map(str, r)) for r in self.rows)

        tt.AsciiTable = AsciiTable
        sys.modules["terminaltables"] = tt
    if "mmengine.logging" not in sys.modules:
        ml = types.ModuleType("mmengine.logging")
        ml.print_log = lambda msg, logger=None: None
        sys.modules["mmengine.logging"] = ml


def _load_file(dotted: str, rel: str):
    spec = importlib.util.spec_from_file_location(
        dotted, os.path.join(REF_ROOT, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub_transform_deps():
    """``point_cloud_transforms.py`` imports torchvision/PIL and two mm
    transform BASE classes at module level.  The executable parity
    targets (``ElasticTransfrom``, ``NormalizePointsColor``) are plain
    ``object`` classes — the bases are only needed so the flip/rot class
    *definitions* parse; they are never instantiated here (their logic
    lives in mm and would be re-derivation to stub)."""
    for name in ("PIL", "torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    md = types.ModuleType("mmdet.datasets.transforms")
    md.RandomFlip = type("RandomFlip", (), {})
    sys.modules.setdefault("mmdet", types.ModuleType("mmdet"))
    sys.modules.setdefault("mmdet.datasets", types.ModuleType("mmdet.datasets"))
    sys.modules["mmdet.datasets.transforms"] = md
    m3t = types.ModuleType("mmdet3d.datasets.transforms")
    m3t.GlobalRotScaleTrans = type("GlobalRotScaleTrans", (), {})
    sys.modules.setdefault("mmdet3d.datasets",
                           types.ModuleType("mmdet3d.datasets"))
    sys.modules["mmdet3d.datasets.transforms"] = m3t
    bbu = types.ModuleType("mmdet3d.structures.bbox_3d.utils")
    bbu.rotation_3d_in_axis = None        # unused by the parity targets
    sys.modules.setdefault("mmdet3d.structures.bbox_3d",
                           types.ModuleType("mmdet3d.structures.bbox_3d"))
    sys.modules["mmdet3d.structures.bbox_3d.utils"] = bbu


_cache = None


def load_reference_modules():
    """Returns dict(loss_3d=, attention=, decoder=, utils=) or None when
    the reference tree / torch is unavailable."""
    global _cache
    if _cache is not None:
        return _cache
    if not os.path.isdir(REF_ROOT):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    if "segdino3d" not in sys.modules:
        _stub_mmengine(torch)
        _stub_misc()
        _stub_mmdet3d()
        _fake_segdino3d(torch)
        _load_file("segdino3d.gtypes", "segdino3d/gtypes.py")
        _load_file("segdino3d.models.module.pc_util",
                   "segdino3d/models/module/pc_util.py")
        _load_file("segdino3d.models.module.utils",
                   "segdino3d/models/module/utils.py")
        _load_file("segdino3d.models.module.attention",
                   "segdino3d/models/module/attention.py")
        _load_file("segdino3d.models.loss.loss_3d",
                   "segdino3d/models/loss/loss_3d.py")
        _load_file("segdino3d.models.decoder.instance_seg_3d_decoder",
                   "segdino3d/models/decoder/instance_seg_3d_decoder.py")
        _load_file("segdino3d.models.architecture.baseline3d",
                   "segdino3d/models/architecture/baseline3d.py")
        _load_file("ref_eval_protocol",
                   "evaluation/utils_instance_seg_3d_eval.py")
        _stub_transform_deps()
        _load_file("ref_pc_transforms",
                   "segdino3d/datasets/transform/point_cloud_transforms.py")
        _stub_dataset_deps(torch)
        _load_file("segdino3d.datasets.dataset.scannet200",
                   "segdino3d/datasets/dataset/scannet200.py")
        _load_file("segdino3d.datasets.dataset.scannet",
                   "segdino3d/datasets/dataset/scannet.py")
    _cache = dict(
        scannet200=sys.modules["segdino3d.datasets.dataset.scannet200"],
        scannet=sys.modules["segdino3d.datasets.dataset.scannet"],
        pc_transforms=sys.modules["ref_pc_transforms"],
        eval_protocol=sys.modules["ref_eval_protocol"],
        loss_3d=sys.modules["segdino3d.models.loss.loss_3d"],
        attention=sys.modules["segdino3d.models.module.attention"],
        utils=sys.modules["segdino3d.models.module.utils"],
        decoder=sys.modules["segdino3d.models.decoder.instance_seg_3d_decoder"],
        baseline3d=sys.modules["segdino3d.models.architecture.baseline3d"],
    )
    return _cache
