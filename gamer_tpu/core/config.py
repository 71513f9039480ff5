"""Dataclass-based configuration with JSON round-trip.

Plays the role of both config layers of the reference framework — the pydantic
JSON configs used by discriminative models (ref: SeqRec/utils/config.py:6-14)
and the HF `PretrainedConfig` directories used by the generative models
(ref: config/s2s-models/*/config.json) — unified behind one dataclass system
that serializes to a single `config.json` per model/checkpoint directory.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Type, TypeVar

T = TypeVar("T", bound="Config")


def config_field(default: Any = dataclasses.MISSING, **kwargs: Any) -> Any:
    """Declare a config field; list/dict defaults get copied per instance."""
    if isinstance(default, (list, dict, set)):
        return dataclasses.field(default_factory=lambda: type(default)(default), **kwargs)
    if default is dataclasses.MISSING:
        return dataclasses.field(**kwargs)
    return dataclasses.field(default=default, **kwargs)


class _ConfigMeta(type):
    """Automatically applies @dataclass to Config subclasses."""

    def __new__(mcs, name, bases, namespace):
        cls = super().__new__(mcs, name, bases, namespace)
        return dataclasses.dataclass(cls)  # type: ignore[call-overload]


class Config(metaclass=_ConfigMeta):
    """Base class for all configs.

    Subclass with plain annotated fields:

        class SASRecConfig(Config):
            hidden_size: int = 64
            num_layers: int = 2

    Supports `from_dict` (ignoring unknown keys, mirroring the tolerant
    behavior of HF `from_pretrained`), `from_file`, `to_dict`, `save`.
    Unknown keys are retained in `.extra` so round-trips don't lose data.
    """

    def __post_init__(self) -> None:
        if not hasattr(self, "_extra"):
            object.__setattr__(self, "_extra", {})

    @property
    def extra(self) -> dict[str, Any]:
        if not hasattr(self, "_extra"):
            object.__setattr__(self, "_extra", {})
        return self._extra

    @classmethod
    def field_names(cls) -> set[str]:
        return {f.name for f in dataclasses.fields(cls)}

    @classmethod
    def from_dict(cls: Type[T], d: dict[str, Any]) -> T:
        names = cls.field_names()
        known = {k: v for k, v in d.items() if k in names}
        unknown = {k: v for k, v in d.items() if k not in names}
        obj = cls(**known)
        obj.extra.update(unknown)
        return obj

    @classmethod
    def from_file(cls: Type[T], path: str) -> T:
        if os.path.isdir(path):
            path = os.path.join(path, "config.json")
        with open(path, "r") as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict[str, Any]:
        d = {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}
        d.update(self.extra)
        return d

    def save(self, path: str) -> str:
        if os.path.isdir(path) or not path.endswith(".json"):
            os.makedirs(path, exist_ok=True)
            path = os.path.join(path, "config.json")
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True, default=_json_default)
        return path

    def replace(self: T, **changes: Any) -> T:
        new = dataclasses.replace(self, **changes)  # type: ignore[type-var]
        new.extra.update(self.extra)
        return new


def _json_default(o: Any) -> Any:
    import numpy as np

    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"Cannot serialize {type(o)} to JSON")
