"""Typed config tree.

Replaces the reference's four-and-a-half config layers (C++ ConfigLine
key=value, nnet3 ``.config`` graph DSL + edit directives, xconfig, shell
argparse, and sed-on-text-models — see SURVEY.md §5.6) with a single typed
dataclass tree that serializes to/from JSON.  Model reconfiguration (the
reference's ``nnet3-copy --edits`` / sed surgery, e.g.
``local/chain_NAS/run_TDNN_DARTSV3_fbk_stride_cvupdate.sh:128-142``) is done
with pure functions over these configs + param pytrees instead.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Type, TypeVar

T = TypeVar("T")


class Config:
    """Marker base class for framework config dataclasses.

    Subclasses must be ``@dataclasses.dataclass``.  Nested Config fields and
    lists/tuples of them round-trip through :func:`asdict_config` /
    :func:`config_from_dict`.
    """

    def replace(self: T, **kw: Any) -> T:
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(asdict_config(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls: Type[T], s: str) -> T:
        return config_from_dict(cls, json.loads(s))


def asdict_config(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        return {f.name: asdict_config(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [asdict_config(v) for v in cfg]
    if isinstance(cfg, dict):
        return {k: asdict_config(v) for k, v in cfg.items()}
    return cfg


def config_from_dict(cls: Type[T], d: Any) -> T:
    """Reconstruct a (possibly nested) Config dataclass from plain dicts."""
    if not (dataclasses.is_dataclass(cls) and isinstance(d, dict)):
        return d  # leaf
    kw = {}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    for name, val in d.items():
        if name not in hints:
            raise ValueError(f"unknown config field {name!r} for {cls.__name__}")
        f = hints[name]
        ftype = f.type
        # Resolve string annotations lazily via the field default's type when
        # nested; keep it simple: if the current default is a dataclass use its
        # class, else if annotation is a dataclass class use it.
        target = None
        if dataclasses.is_dataclass(ftype):
            target = ftype
        elif f.default is not dataclasses.MISSING and dataclasses.is_dataclass(type(f.default)):
            target = type(f.default)
        elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
            proto = f.default_factory()  # type: ignore[misc]
            if dataclasses.is_dataclass(type(proto)):
                target = type(proto)
        if target is not None and isinstance(val, dict):
            kw[name] = config_from_dict(target, val)
        elif isinstance(val, list):
            kw[name] = [
                config_from_dict(target, v) if target is not None and isinstance(v, dict) else v
                for v in val
            ]
        else:
            kw[name] = val
    return cls(**kw)  # type: ignore[call-arg]
