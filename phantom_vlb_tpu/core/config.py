"""Hydra-like configuration system (compose / override / interpolate).

The reference drives training through Hydra + OmegaConf
(``train.py:7-12``, ``config/base.yaml``, ``config/experiment/*.yaml``):
a ``defaults`` list composes a base config with an experiment overlay at the
global package, ``${}`` interpolation resolves cross-references, CLI overrides
like ``subject=sub-01`` mutate the tree, and ``_target_`` nodes instantiate
objects.  This module provides those semantics natively with no Hydra
dependency:

- :func:`load_config`     — compose base + experiment + CLI overrides.
- :class:`Config`         — an attribute-access mapping over the tree.
- :func:`instantiate`     — recursive ``_target_`` object construction.
- ``${a.b.c}``            — interpolation against the composed root.
- ``${env:VAR[,default]}``/``$VAR`` — environment lookups (reference uses a
  raw ``$SCRATCH_PATH`` string-replace, datamodule.py:138; both forms work).
"""

from __future__ import annotations

import copy
import importlib
import os
import re
from pathlib import Path
from typing import Any, Iterable, Mapping

import yaml

__all__ = ["Config", "load_config", "instantiate", "to_dict"]

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")
_ENV_RE = re.compile(r"\$([A-Z_][A-Z0-9_]*)")


class Config(dict):
    """A dict with attribute access and dotted-path get/set."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get_path(self, path: str, default: Any = ...) -> Any:
        node: Any = self
        for part in path.split("."):
            if isinstance(node, Mapping) and part in node:
                node = node[part]
            elif isinstance(node, (list, tuple)) and part.isdigit():
                node = node[int(part)]
            else:
                if default is ...:
                    raise KeyError(path)
                return default
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node: Any = self
        for part in parts[:-1]:
            if not isinstance(node.get(part), Mapping):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = value


def _wrap(obj: Any) -> Any:
    if isinstance(obj, Mapping) and not isinstance(obj, Config):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, Config):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def _deep_merge(dst: Config, src: Mapping) -> Config:
    """Merge ``src`` into ``dst`` (src wins; dicts merge recursively)."""
    for k, v in src.items():
        if isinstance(v, Mapping) and isinstance(dst.get(k), Mapping):
            _deep_merge(dst[k], v)
        else:
            dst[k] = _wrap(v)
    return dst


def _parse_scalar(text: str) -> Any:
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def _resolve_value(value: Any, root: Config, *, _depth: int = 0) -> Any:
    if _depth > 32:
        raise RecursionError("interpolation cycle detected")
    if isinstance(value, str):
        # Full-string interpolation keeps the referenced value's type.
        m = _INTERP_RE.fullmatch(value)
        if m:
            return _resolve_ref(m.group(1), root, _depth)

        def sub(match: re.Match) -> str:
            return str(_resolve_ref(match.group(1), root, _depth))

        out = _INTERP_RE.sub(sub, value)
        out = _ENV_RE.sub(lambda m2: os.environ.get(m2.group(1), m2.group(0)), out)
        return out
    if isinstance(value, Mapping):
        return Config({k: _resolve_value(v, root, _depth=_depth + 1) for k, v in value.items()})
    if isinstance(value, list):
        return [_resolve_value(v, root, _depth=_depth + 1) for v in value]
    return value


def _resolve_ref(expr: str, root: Config, depth: int) -> Any:
    expr = expr.strip()
    if expr.startswith("env:"):
        body = expr[len("env:") :]
        var, _, default = body.partition(",")
        if var in os.environ:
            return os.environ[var]
        if _:
            return _parse_scalar(default.strip())
        raise KeyError(f"environment variable {var!r} is not set")
    ref = root.get_path(expr)
    return _resolve_value(ref, root, _depth=depth + 1)


def resolve(cfg: Config) -> Config:
    """Resolve all interpolations against the tree's own root."""
    return _resolve_value(cfg, cfg)  # type: ignore[return-value]


def _load_yaml(path: Path) -> Config:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return _wrap(data)


def load_config(
    config_path: str | Path,
    config_name: str = "base",
    overrides: Iterable[str] = (),
    resolve_interpolations: bool = True,
) -> Config:
    """Compose ``<config_path>/<config_name>.yaml`` with overlays + overrides.

    ``defaults`` entries of the form ``- experiment: null`` name overlay
    groups; an override ``experiment=foo`` loads
    ``<config_path>/experiment/foo.yaml`` and deep-merges it at the root
    (the reference's ``# @package _global_`` behavior).
    ``- _self_`` controls whether the base file wins over earlier defaults.
    """
    config_dir = Path(config_path)
    base = _load_yaml(config_dir / f"{config_name}.yaml")
    defaults = base.pop("defaults", [])

    # Collect group selections from the defaults list, then let overrides
    # rebind them (e.g. experiment=VLB_vllama2_friends_lora).
    group_choice: dict[str, Any] = {}
    order: list[str] = []
    for entry in defaults:
        if entry == "_self_":
            order.append("_self_")
            continue
        if isinstance(entry, Mapping):
            ((group, choice),) = entry.items()
            group_choice[str(group)] = choice
            order.append(str(group))

    plain_overrides: list[tuple[str, Any]] = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must look like key=value")
        key, _, raw = ov.partition("=")
        key = key.lstrip("+")
        if key in group_choice:
            group_choice[key] = raw
        else:
            plain_overrides.append((key, _parse_scalar(raw)))

    composed = Config()
    if "_self_" not in order:
        order.append("_self_")
    for item in order:
        if item == "_self_":
            _deep_merge(composed, base)
            continue
        choice = group_choice.get(item)
        if choice in (None, "null"):
            continue
        overlay = _load_yaml(config_dir / item / f"{choice}.yaml")
        _deep_merge(composed, overlay)

    for key, value in plain_overrides:
        composed.set_path(key, _wrap(value))

    if resolve_interpolations:
        composed = resolve(composed)
    return composed


def _import_target(target: str) -> Any:
    module_name, _, attr = target.rpartition(".")
    if not module_name:
        raise ValueError(f"cannot import bare name {target!r}")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def instantiate(node: Any, **kwargs: Any) -> Any:
    """Recursively construct objects from ``_target_`` nodes.

    Mirrors ``hydra.utils.instantiate`` as used by the reference
    (``train.py:32-54``): every mapping with a ``_target_`` key becomes a call
    to the imported callable with the remaining keys (recursively
    instantiated) as keyword arguments.
    """
    if isinstance(node, Mapping):
        if "_target_" in node:
            target = _import_target(str(node["_target_"]).strip())
            call_kwargs = {
                k: instantiate(v) for k, v in node.items() if k != "_target_"
            }
            call_kwargs.update(kwargs)
            return target(**call_kwargs)
        return Config({k: instantiate(v) for k, v in node.items()})
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def to_dict(cfg: Any) -> Any:
    """Plain-dict copy (for hparam logging / serialization)."""
    if isinstance(cfg, Mapping):
        return {k: to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [to_dict(v) for v in cfg]
    return copy.deepcopy(cfg)
