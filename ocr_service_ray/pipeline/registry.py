"""Stage registry: the user-extension surface of the engine.

The reference's implicit step API is three independently callable
stages composed by an endpoint (``extract_qrcode`` / ``extract_text`` /
``structure_data``, /root/reference/app/main.py:122-124). Our explicit
form (SURVEY.md §2.10): a stage is a named batch transform —

- a function ``(pa.Table) -> pa.Table``          (stateless task stage)
- or a class with ``__init__``/``__call__``      (actor-pool stage)

registered under a name; a pipeline is a list of stage names (plus
per-stage Ray options), applied to a ``ray.data.Dataset`` in order.
Users extend the engine by registering a callable — no engine changes.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any

_REGISTRY: dict[str, "StageDef"] = {}


@dataclass(frozen=True)
class StageDef:
    name: str
    fn: Any  # callable or actor class
    is_actor: bool
    default_opts: dict = field(default_factory=dict)

    def apply(self, ds, **overrides):
        opts = {"batch_format": "pyarrow", **self.default_opts, **overrides}
        if self.is_actor:
            opts.setdefault("concurrency", (1, 4))
        return ds.map_batches(self.fn, **opts)


def register_stage(name: str, fn=None, **default_opts):
    """Register a stage (usable as decorator or direct call)."""

    def _reg(f):
        _REGISTRY[name] = StageDef(
            name=name,
            fn=f,
            is_actor=inspect.isclass(f),
            default_opts=default_opts,
        )
        return f

    return _reg(fn) if fn is not None else _reg


def get_stage(name: str) -> StageDef:
    if name not in _REGISTRY:
        raise KeyError(f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_stages() -> list[str]:
    return sorted(_REGISTRY)


def build_pipeline(ds, stages: list[str | tuple[str, dict]]):
    """Apply named stages in order; each entry is a name or (name, opts)."""
    for entry in stages:
        name, opts = entry if isinstance(entry, tuple) else (entry, {})
        ds = get_stage(name).apply(ds, **opts)
    return ds


# ----------------------------------------------------------------------
# built-in stages

def _register_builtins() -> None:
    from ..stages.batch_stages import OcrStage, explode_and_extract
    from ..stages.multimodal import (
        AudioFeatureStage,
        FrameSampleStage,
        ImageFeatureStage,
    )

    register_stage("explode_extract", explode_and_extract)
    register_stage("ocr", OcrStage)
    register_stage("audio_features", AudioFeatureStage, batch_size=64)
    register_stage("frame_sample", FrameSampleStage, batch_size=16)
    register_stage("image_features", ImageFeatureStage, batch_size=32)


_register_builtins()
