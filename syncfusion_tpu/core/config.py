"""Configuration system preserving the reference's CLI/config UX.

The reference uses two config dialects (SURVEY §5):
  (a) Hydra/OmegaConf for the diffusion side — a root ``config.yaml`` with
      ``exp=`` experiment overlays (``# @package _global_`` files under
      ``exp/``), ``${...}`` interpolation incl. ``${oc.env:VAR}``, dotted CLI
      overrides, and object construction from ``_target_``/``_partial_``
      nodes (reference: script/train_diffusion_model.py:21-114).
  (b) LightningCLI/jsonargparse for the onset side — ``class_path`` /
      ``init_args`` YAML trees composed with repeated ``-c`` flags
      (reference: script/train_onset_model.py:16-35).

Neither hydra nor omegaconf is a dependency here; this module implements the
subset both dialects need on top of PyYAML:

  * ``load_config(root, overrides)`` — root yaml + ``exp=NAME`` overlay merge
    + dotted overrides (``a.b.c=val``, ``+new.key=val``) + interpolation.
  * ``instantiate(node)`` — recursive ``_target_``/``_partial_`` and
    ``class_path``/``init_args`` construction.
"""

from __future__ import annotations

import functools
import importlib
import os
import re
from pathlib import Path
from typing import Any, Iterable, Mapping, MutableMapping, Optional

import yaml

__all__ = ["Config", "load_config", "instantiate", "merge", "resolve",
           "to_plain", "yaml_load"]


def to_plain(obj: Any) -> Any:
    """Recursively convert Config trees to plain dict/list for yaml dumping."""
    if isinstance(obj, Mapping):
        return {k: to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_plain(v) for v in obj]
    return obj


class Config(dict):
    """A dict with attribute access, used for every config node."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, Mapping) and not isinstance(obj, Config):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, Config):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj


class _Loader(yaml.SafeLoader):
    """SafeLoader that also accepts ``1e-4``-style floats (YAML 1.2 / hydra
    semantics; plain YAML 1.1 reads them as strings)."""


_Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def yaml_load(stream) -> Any:
    """Project-dialect YAML load (accepts ``1e-8``-style floats).

    ALWAYS use this instead of ``yaml.safe_load`` for config files: plain
    YAML 1.1 reads exponent-without-dot numerals as STRINGS, which then
    explode deep inside jitted optimizers (``eps`` as ``'1e-8'``)."""
    return yaml.load(stream, Loader=_Loader)




def _load_yaml(path: Path) -> Config:
    with open(path) as f:
        data = yaml_load(f.read()) or {}
    if not isinstance(data, dict):
        raise ValueError(f"{path} must contain a mapping at top level")
    return Config.wrap(data)


def merge(base: MutableMapping, overlay: Mapping) -> Config:
    """Deep-merge ``overlay`` into ``base`` (overlay wins; dicts recurse)."""
    out = Config(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge(Config(out[k]), v)
        else:
            out[k] = Config.wrap(v)
    return out


_INTERP = re.compile(r"\$\{([^{}]+)\}")


def _lookup(root: Mapping, dotted: str) -> Any:
    node: Any = root
    for part in dotted.split("."):
        if isinstance(node, Mapping) and part in node:
            node = node[part]
        else:
            raise KeyError(f"interpolation key {dotted!r} not found")
    return node


def _resolve_value(val: Any, root: Mapping) -> Any:
    if not isinstance(val, str):
        return val
    m = _INTERP.fullmatch(val)
    if m:  # whole-string interpolation keeps the referent's type
        return _resolve_ref(m.group(1), root)

    def sub(match: re.Match) -> str:
        return str(_resolve_ref(match.group(1), root))

    return _INTERP.sub(sub, val)


def _resolve_ref(expr: str, root: Mapping) -> Any:
    expr = expr.strip()
    if expr.startswith("oc.env:"):
        rest = expr[len("oc.env:"):]
        name, _, default = rest.partition(",")
        value = os.environ.get(name.strip())
        if value is None:
            if default:
                return yaml_load(default)
            raise KeyError(f"environment variable {name!r} not set")
        return value
    target = _lookup(root, expr)
    return _resolve_value(target, root)


def resolve(cfg: Config, root: Optional[Mapping] = None) -> Config:
    """Resolve all ``${...}`` interpolations (recursively, against root)."""
    root = root if root is not None else cfg

    def walk(node: Any) -> Any:
        if isinstance(node, Mapping):
            return Config({k: walk(v) for k, v in node.items()})
        if isinstance(node, list):
            return [walk(v) for v in node]
        return _resolve_value(node, root)

    return walk(cfg)


def _parse_override(item: str) -> tuple[str, Any, bool]:
    additive = item.startswith("+")
    if additive:
        item = item[1:]
    key, _, raw = item.partition("=")
    return key, yaml_load(raw) if raw != "" else None, additive


def _set_dotted(cfg: MutableMapping, dotted: str, value: Any, additive: bool) -> None:
    parts = dotted.split(".")
    node: MutableMapping = cfg
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], MutableMapping):
            if not additive and p not in node:
                raise KeyError(
                    f"override key {dotted!r}: {p!r} not in config (prefix with + to add)"
                )
            node[p] = Config()
        node = node[p]
    if not additive and parts[-1] not in node:
        raise KeyError(
            f"override key {dotted!r} not in config (prefix with + to add)"
        )
    node[parts[-1]] = Config.wrap(value)


def load_config(
    config_path: str | Path,
    overrides: Iterable[str] = (),
    exp_dir: str = "exp",
) -> Config:
    """Load root yaml, apply ``exp=`` overlay then dotted overrides, resolve.

    Mirrors the reference invocation style, e.g.::

        load_config("config.yaml", ["exp=train_diffusion_gh",
                                    "datamodule.batch_size=2", "+ckpt=..."])
    """
    config_path = Path(config_path)
    cfg = _load_yaml(config_path)

    overrides = list(overrides)
    exp_name = None
    rest: list[str] = []
    for item in overrides:
        if item.startswith("exp="):
            exp_name = item.split("=", 1)[1]
        else:
            rest.append(item)

    if exp_name:
        exp_path = config_path.parent / exp_dir / f"{exp_name}.yaml"
        overlay = _load_yaml(exp_path)
        # ``defaults: [model: NAME]`` pulls sibling group files first.
        for entry in overlay.pop("defaults", []) or []:
            if isinstance(entry, Mapping):
                for group, name in entry.items():
                    group_file = exp_path.parent / str(group) / f"{name}.yaml"
                    cfg = merge(cfg, _load_yaml(group_file))
        cfg = merge(cfg, overlay)
        cfg["exp"] = exp_name

    for item in rest:
        key, value, additive = _parse_override(item)
        _set_dotted(cfg, key, value, additive)

    return resolve(cfg)


def _import_target(path: str) -> Any:
    module_name, _, attr = path.rpartition(".")
    if not module_name:
        raise ValueError(f"cannot import bare name {path!r}")
    return getattr(importlib.import_module(module_name), attr)


def instantiate(node: Any, **kwargs: Any) -> Any:
    """Recursively build objects from ``_target_`` / ``class_path`` nodes.

    ``_partial_: true`` returns a ``functools.partial`` instead of calling.
    Non-target mappings / lists are traversed; scalars pass through.
    """
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    if not isinstance(node, Mapping):
        return node

    node = dict(node)
    target_key = "_target_" if "_target_" in node else (
        "class_path" if "class_path" in node else None
    )
    if target_key is None:
        return Config({k: instantiate(v) for k, v in node.items()})

    if target_key == "class_path":
        target = node.pop("class_path")
        call_kwargs = {k: instantiate(v) for k, v in node.pop("init_args", {}).items()}
        partial = False
    else:
        target = node.pop("_target_")
        partial = bool(node.pop("_partial_", False))
        call_kwargs = {k: instantiate(v) for k, v in node.items()}

    fn = _import_target(target)
    call_kwargs.update(kwargs)
    if partial:
        return functools.partial(fn, **call_kwargs)
    return fn(**call_kwargs)
