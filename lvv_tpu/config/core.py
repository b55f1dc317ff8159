"""Typed configuration system.

The reference uses three ad-hoc config styles (SURVEY.md §5): a giant Python
dict in ``src/encoder-decoder/train.py:41-322``, YAML with ``_BASE_CONFIG_``
inheritance in ``src/lidar-encoder/pcdet/config.py:51-85``, and module-level
CONFIG dicts in scripts. This module unifies them: frozen dataclasses with
dotted-path overrides, JSON/YAML file loading with recursive ``_base_``
inheritance, and round-trip serialization so configs embed into checkpoints
(reference: checkpoints.py:114, model_loader.py:46-52).
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Mapping, Sequence, Type, TypeVar

T = TypeVar("T")

_BASE_KEY = "_base_"


def config(cls: Type[T]) -> Type[T]:
    """Decorator: a frozen, keyword-only config dataclass."""
    return dataclasses.dataclass(frozen=True)(cls)


def to_dict(cfg: Any) -> Any:
    """Recursively convert a config dataclass tree to plain dicts/lists."""
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    if isinstance(cfg, Mapping):
        return {k: to_dict(v) for k, v in cfg.items()}
    return cfg


def from_dict(cls: Type[T], data: Mapping[str, Any]) -> T:
    """Build a config dataclass tree from nested dicts, type-checking keys."""
    if not dataclasses.is_dataclass(cls):
        return data  # leaf passthrough
    field_map = {f.name: f for f in dataclasses.fields(cls)}
    kwargs: dict[str, Any] = {}
    for k, v in data.items():
        if k.startswith("_"):
            continue  # comment/meta keys (e.g. "_comment")
        if k not in field_map:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}; "
                           f"valid keys: {sorted(field_map)}")
        f = field_map[k]
        ftype = f.type if isinstance(f.type, type) else _resolve_type(cls, f)
        if dataclasses.is_dataclass(ftype) and isinstance(v, Mapping):
            kwargs[k] = from_dict(ftype, v)
        elif isinstance(v, list):
            kwargs[k] = tuple(v) if _wants_tuple(f) else v
        else:
            kwargs[k] = v
    return cls(**kwargs)


def _resolve_type(cls: type, f: dataclasses.Field) -> Any:
    import typing
    hints = typing.get_type_hints(cls)
    return hints.get(f.name, object)


def _wants_tuple(f: dataclasses.Field) -> bool:
    t = str(f.type)
    return "uple" in t  # Tuple/tuple


def replace(cfg: T, **updates: Any) -> T:
    return dataclasses.replace(cfg, **updates)


def override(cfg: T, path: str, value: Any) -> T:
    """Return a copy of `cfg` with the dotted `path` replaced by `value`.

    Replaces pcdet's ``--set k v`` dotted CLI overrides
    (reference pcdet/config.py:16-48, cfg_from_list).
    """
    parts = path.split(".")
    if len(parts) == 1:
        return dataclasses.replace(cfg, **{parts[0]: value})
    child = getattr(cfg, parts[0])
    return dataclasses.replace(cfg, **{parts[0]: override(child, ".".join(parts[1:]), value)})


def apply_overrides(cfg: T, pairs: Sequence[str]) -> T:
    """Apply ``key.path=value`` strings (values parsed as JSON, else str)."""
    for pair in pairs:
        path, _, raw = pair.partition("=")
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        cfg = override(cfg, path.strip(), value)
    return cfg


def _load_raw(path: pathlib.Path) -> dict:
    text = path.read_text()
    if path.suffix in (".yaml", ".yml"):
        import yaml  # optional dep; baked into the image via pcdet deps
        return yaml.safe_load(text)
    return json.loads(text)


def load_file(path: str | pathlib.Path) -> dict:
    """Load a JSON/YAML config dict with recursive ``_base_`` inheritance.

    Mirrors pcdet's ``_BASE_CONFIG_`` merge (reference pcdet/config.py:51-85)
    but with child-wins deep-merge semantics.
    """
    path = pathlib.Path(path)
    data = _load_raw(path)
    base_ref = data.pop(_BASE_KEY, None)
    if base_ref is not None:
        base = load_file((path.parent / base_ref).resolve())
        data = deep_merge(base, data)
    return data


def deep_merge(base: dict, child: dict) -> dict:
    out = dict(base)
    for k, v in child.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load(cls: Type[T], path: str | pathlib.Path,
         overrides: Sequence[str] = ()) -> T:
    cfg = from_dict(cls, load_file(path))
    return apply_overrides(cfg, overrides)


def save(cfg: Any, path: str | pathlib.Path) -> None:
    pathlib.Path(path).write_text(json.dumps(to_dict(cfg), indent=2))
