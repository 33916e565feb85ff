"""JSON config system with `parent` inheritance and // comments.

Reference semantics:
- `load_network_config` with recursive `parent` merge — src/testbed.cu:246-272.
  A child config deep-merges on top of its parent (see configs/nerf/small.json,
  which overrides only `optimizer.nested.decay_start` of base.json).
- mode-based search path configs/<mode>/<name> — `find_network_config`,
  src/testbed.cu:220-236.
- Configs may contain //-style comments (configs/image/base.json).
"""

from __future__ import annotations

import copy
import json
import os
import re
from typing import Any, Dict, Optional

# Default config roots searched by find_network_config, in order.
CONFIG_SEARCH_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "configs"),
]


def strip_json_comments(text: str) -> str:
    """Remove // line comments and /* */ block comments outside strings."""
    out = []
    i, n = 0, len(text)
    in_str = False
    while i < n:
        c = text[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
            i += 1
        else:
            if c == '"':
                in_str = True
                out.append(c)
                i += 1
            elif c == "/" and i + 1 < n and text[i + 1] == "/":
                while i < n and text[i] != "\n":
                    i += 1
            elif c == "/" and i + 1 < n and text[i + 1] == "*":
                i += 2
                while i + 1 < n and not (text[i] == "*" and text[i + 1] == "/"):
                    i += 1
                i += 2
            else:
                out.append(c)
                i += 1
    return "".join(out)


def loads_json(text: str) -> Any:
    return json.loads(strip_json_comments(text))


def load_json(path: str) -> Any:
    with open(path, "r") as f:
        return loads_json(f.read())


def deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge `override` on top of `base` (override wins)."""
    result = copy.deepcopy(base)
    for k, v in override.items():
        if k in result and isinstance(result[k], dict) and isinstance(v, dict):
            result[k] = deep_merge(result[k], v)
        else:
            result[k] = copy.deepcopy(v)
    return result


def load_network_config(path: str, _seen=None) -> Dict[str, Any]:
    """Load a network config, resolving `parent` chains.

    Parent paths are resolved relative to the directory of the child file,
    as in the reference (src/testbed.cu:246-272). The `parent` key is
    removed from the result. Cyclic parent chains raise ValueError.
    """
    abspath = os.path.abspath(path)
    seen = _seen or set()
    if abspath in seen:
        raise ValueError(f"cyclic `parent` chain involving {abspath}")
    seen = seen | {abspath}
    cfg = load_json(path)
    if not isinstance(cfg, dict):
        raise ValueError(f"network config must be a JSON object: {path}")
    parent = cfg.pop("parent", None)
    if parent is not None:
        parent_path = os.path.join(os.path.dirname(abspath), parent)
        parent_cfg = load_network_config(parent_path, seen)
        cfg = deep_merge(parent_cfg, cfg)
    return cfg


def find_network_config(name: str, mode: Optional[str] = None,
                        search_paths=None) -> str:
    """Locate a config by name; mirrors find_network_config (testbed.cu:220-236).

    Tries, in order: the literal path; <root>/<name>; <root>/<mode>/<name>;
    each with and without a .json suffix.
    """
    candidates = []
    names = [name] if name.endswith(".json") else [name + ".json", name]
    roots = list(search_paths or CONFIG_SEARCH_PATHS)
    for nm in names:
        candidates.append(nm)
        for root in roots:
            candidates.append(os.path.join(root, nm))
            if mode:
                candidates.append(os.path.join(root, mode, nm))
    for c in candidates:
        if os.path.isfile(c):
            return c
    raise FileNotFoundError(
        f"network config {name!r} not found (mode={mode}, tried {len(candidates)} paths)")


_KEY_RE = re.compile(r"[^.]+")


def get_path(cfg: Dict[str, Any], dotted: str, default=None):
    """cfg['a.b.c'] style access for nested optimizer hyperparam mutation
    (reference walks the `nested` chain at runtime, src/testbed.cu:4079-4085)."""
    node = cfg
    for key in _KEY_RE.findall(dotted):
        if not isinstance(node, dict) or key not in node:
            return default
        node = node[key]
    return node


def set_path(cfg: Dict[str, Any], dotted: str, value) -> None:
    keys = _KEY_RE.findall(dotted)
    node = cfg
    for key in keys[:-1]:
        node = node.setdefault(key, {})
    node[keys[-1]] = value
