"""Minimal Hydra-style config system (composition + interpolation + CLI).

The reference is configured exclusively through Hydra 1.3 composed YAML
(config/basic.yaml's ``defaults`` list, ``${}`` interpolation, ``???``
mandatory markers, ``key=value`` CLI overrides — SURVEY §2.7). Hydra is not
available in this environment, so this module reimplements the subset the
framework needs:

  * ``defaults:`` list composition (later entries override earlier;
    ``_self_`` positions the file's own keys),
  * ``${a.b.c}`` interpolation (absolute paths into the merged tree),
  * ``???`` mandatory values (error if still unset after overrides),
  * dotted CLI overrides ``a.b=1`` plus ``+a.b=1`` additions and
    ``--config-name=...`` selection,
  * attribute-style access on nested dicts.
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import yaml

MISSING = "???"
_INTERP = re.compile(r"\$\{([^}]+)\}")


class Config(dict):
    """Dict with attribute access and dotted-path get/set."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def select(self, path: str, default=None):
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value):
        parts = path.split(".")
        node = self
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                node[p] = Config()
            node = node[p]
        node[parts[-1]] = value

    def to_dict(self) -> dict:
        def conv(v):
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return conv(self)


_FLOAT_LITERAL = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _coerce(v):
    """YAML 1.1 parses exponent literals without a sign ('3.0e6', '1e-3')
    as strings; coerce them to floats so configs behave as written."""
    if isinstance(v, str) and _FLOAT_LITERAL.match(v):
        return float(v)
    return v


def _wrap(obj):
    if isinstance(obj, dict):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return _coerce(obj)


def _merge(base: Config, over: Union[Config, dict]) -> Config:
    """Deep merge ``over`` into ``base`` (over wins); returns base."""
    for k, v in over.items():
        if k in base and isinstance(base[k], dict) and isinstance(v, dict):
            _merge(base[k], v)
        else:
            base[k] = copy.deepcopy(v)
    return base


def _parse_value(text: str):
    try:
        return _wrap(yaml.safe_load(text))
    except yaml.YAMLError:
        return text


def _resolve_interp(root: Config, node, path="") -> Any:
    if isinstance(node, dict):
        for k in list(node):
            node[k] = _resolve_interp(root, node[k], f"{path}.{k}")
        return node
    if isinstance(node, list):
        return [_resolve_interp(root, v, path) for v in node]
    if isinstance(node, str):
        full = _INTERP.fullmatch(node.strip())
        if full:  # whole-string interpolation keeps the referenced type
            ref = root.select(full.group(1))
            if ref is None:
                raise KeyError(f"interpolation ${{{full.group(1)}}} unresolved at {path}")
            return _resolve_interp(root, copy.deepcopy(ref), path)

        def sub(m):
            ref = root.select(m.group(1))
            if ref is None:
                raise KeyError(f"interpolation ${{{m.group(1)}}} unresolved at {path}")
            return str(ref)

        return _INTERP.sub(sub, node)
    return node


def _check_missing(node, path=""):
    if isinstance(node, dict):
        for k, v in node.items():
            _check_missing(v, f"{path}.{k}" if path else k)
    elif isinstance(node, str) and node == MISSING:
        raise ValueError(f"mandatory config value '{path}' is unset (???)")


def _load_file(config_dir: Path, name: str) -> Config:
    p = config_dir / f"{name}.yaml"
    with open(p) as f:
        raw = yaml.safe_load(f) or {}
    raw = _wrap(raw)
    defaults: List[str] = raw.pop("defaults", [])
    out = Config()
    merged_self = False
    for entry in defaults:
        if entry == "_self_":
            _merge(out, raw)
            merged_self = True
        else:
            _merge(out, _load_file(config_dir, str(entry)))
    if not merged_self:
        _merge(out, raw)
    return out


def load_config(
    config_dir: Union[str, Path],
    name: str = "basic",
    overrides: Optional[Sequence[str]] = None,
    check_missing: bool = True,
) -> Config:
    """Compose ``<config_dir>/<name>.yaml`` with overrides, hydra-style."""
    cfg = _load_file(Path(config_dir), name)
    for ov in overrides or []:
        if ov.startswith("--config-name="):
            continue
        add = ov.startswith("+")
        body = ov[1:] if add else ov
        if "=" not in body:
            raise ValueError(f"override '{ov}' must be key=value")
        key, val = body.split("=", 1)
        cfg.set_path(key.strip(), _parse_value(val))
    _resolve_interp(cfg, cfg)
    if check_missing:
        _check_missing(cfg)
    return cfg


def cli_config(argv: Sequence[str], config_dir, default_name: str = "basic") -> Config:
    """Parse a hydra-like CLI: positional key=value overrides +
    ``--config-name=foo``."""
    name = default_name
    overrides = []
    for a in argv:
        if a.startswith("--config-name="):
            name = a.split("=", 1)[1]
        else:
            overrides.append(a)
    return load_config(config_dir, name, overrides)
