"""String-keyed registries for config-driven construction.

The reference framework wires every component through mmdet registries
(`@DETECTORS.register_module()` etc.; see reference
nuhtc/models/__init__.py:1-10). We keep the same ergonomics — configs say
``dict(type='SwinTransformer', ...)`` and the registry instantiates the
class — with a minimal homegrown implementation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._registry: Dict[str, Callable] = {}

    def register(self, name: str | None = None):
        def deco(cls):
            key = name or cls.__name__
            if key in self._registry and self._registry[key] is not cls:
                raise KeyError(f"{key!r} already registered in {self.name}")
            self._registry[key] = cls
            return cls

        return deco

    def get(self, key: str) -> Callable:
        if key not in self._registry:
            raise KeyError(
                f"{key!r} is not registered in {self.name}; "
                f"known: {sorted(self._registry)}"
            )
        return self._registry[key]

    def build(self, cfg: Dict[str, Any], **extra) -> Any:
        """Instantiate from a ``dict(type='Name', ...)`` config."""
        if cfg is None:
            return None
        cfg = dict(cfg)
        typ = cfg.pop("type")
        cls = self.get(typ)
        cfg.update(extra)
        return cls(**cfg)

    def __contains__(self, key):
        return key in self._registry


BACKBONES = Registry("backbones")
NECKS = Registry("necks")
HEADS = Registry("heads")
ROI_EXTRACTORS = Registry("roi_extractors")
DETECTORS = Registry("detectors")
LOSSES = Registry("losses")
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
