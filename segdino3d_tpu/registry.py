"""Component registries for config-driven dependency injection.

Mirrors the registry surface of the reference framework
(``/root/reference/segdino3d/builder.py:3-83``): every model / data / loss
component is instantiated from a ``dict(type='ClassName', ...)`` config node
through a named registry.  Unlike the reference (mmengine), this is a small
self-contained implementation with no external dependency.
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """A name -> class/callable registry with ``build`` support."""

    def __init__(self, name: str):
        self.name = name
        self._modules: Dict[str, Callable] = {}

    def register_module(self, name: Optional[str] = None, module: Optional[Callable] = None):
        if module is not None:
            self._register(name or module.__name__, module)
            return module

        def _decorator(cls):
            self._register(name or cls.__name__, cls)
            return cls

        return _decorator

    def _register(self, name: str, module: Callable):
        if name in self._modules and self._modules[name] is not module:
            raise KeyError(f"{name!r} already registered in {self.name}")
        self._modules[name] = module

    def get(self, name: str) -> Callable:
        if name not in self._modules:
            raise KeyError(
                f"{name!r} not found in registry {self.name!r}. "
                f"Available: {sorted(self._modules)}")
        return self._modules[name]

    def __contains__(self, name: str) -> bool:
        return name in self._modules

    def build(self, cfg: Optional[Dict[str, Any]], **extra) -> Any:
        return build_from_cfg(cfg, self, **extra)


def build_from_cfg(cfg: Optional[Dict[str, Any]], registry: Registry, **extra) -> Any:
    """Instantiate ``registry[cfg['type']](**cfg_without_type, **extra)``."""
    if cfg is None:
        return None
    if not isinstance(cfg, dict):
        raise TypeError(f"cfg must be a dict, got {type(cfg)}")
    cfg = dict(cfg)
    obj_type = cfg.pop("type", None)
    if obj_type is None:
        raise KeyError(f"cfg for registry {registry.name!r} has no 'type': {cfg}")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
    elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"'type' must be a str or class, got {type(obj_type)}")
    cfg.update(extra)
    return obj_cls(**cfg)


# The same registry groups the reference exposes (builder.py:3-17).
BACKBONES = Registry("backbones")
DECODERS = Registry("decoders")
ARCHITECTURES = Registry("architectures")
LOSSES = Registry("losses")
MATCHERS = Registry("matchers")
DATASETS = Registry("datasets")
TRANSFORMS = Registry("transforms")
PREPARERS = Registry("preparers")
EVALUATORS = Registry("evaluators")
NECKS = Registry("necks")
TEXT_ENCODERS = Registry("text_encoders")
OPTIMIZERS = Registry("optimizers")
SCHEDULERS = Registry("schedulers")
SAMPLERS = Registry("samplers")
HOOKS = Registry("hooks")


def build_backbone(cfg, **kw):
    return BACKBONES.build(cfg, **kw)


def build_decoder(cfg, **kw):
    return DECODERS.build(cfg, **kw)


def build_architecture(cfg, **kw):
    return ARCHITECTURES.build(cfg, **kw)


def build_loss(cfg, **kw):
    return LOSSES.build(cfg, **kw)


def build_matcher(cfg, **kw):
    return MATCHERS.build(cfg, **kw)


def build_dataset(cfg, **kw):
    return DATASETS.build(cfg, **kw)


def build_transform(cfg, **kw):
    return TRANSFORMS.build(cfg, **kw)


def build_preparer(cfg, **kw):
    return PREPARERS.build(cfg, **kw)


def build_evaluator(cfg, **kw):
    return EVALUATORS.build(cfg, **kw)


def build_text_encoder(cfg, **kw):
    return TEXT_ENCODERS.build(cfg, **kw)
