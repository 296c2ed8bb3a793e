"""Dependency-free Hydra-style config engine.

The reference is driven by Hydra + OmegaConf (/root/reference/main.py:8-21,
configs/base.yaml defaults list, ``${...}`` interpolation and the ``calc``
arithmetic resolver). Neither package exists in this environment, so the
framework ships a small engine with the same surface:

* config groups: ``defaults: [{pipeline: mat_invent}, {model: diffcsp}, ...]``
  load ``configs/<group>/<name>.yaml`` into ``cfg[group]``;
* CLI overrides: ``group=name`` switches a group file, ``a.b.c=value`` sets a
  leaf (YAML-parsed value), ``+a.b=v`` adds a new leaf;
* interpolation: ``${path.to.key}`` and ``${calc:'<arith expr>'}``;
* instantiation: ``_target_: pkg.mod.Class`` nodes become objects, recursively
  (disable with ``_recursive_: false``).
"""
from __future__ import annotations

import ast
import importlib
import os
import re
from typing import Any

import yaml

_INTERP = re.compile(r"\$\{([^${}]+)\}")


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _get_path(cfg: dict, path: str):
    node: Any = cfg
    for part in path.split("."):
        if isinstance(node, dict) and part in node:
            node = node[part]
        elif isinstance(node, list) and part.lstrip("-").isdigit():
            node = node[int(part)]
        else:
            raise KeyError(path)
    return node


def _set_path(cfg: dict, path: str, value: Any) -> None:
    parts = path.split(".")
    node = cfg
    for part in parts[:-1]:
        if isinstance(node, list) and part.lstrip("-").isdigit():
            node = node[int(part)]
        elif isinstance(node, dict):
            node = node.setdefault(part, {})
        else:
            raise KeyError(f"cannot descend into {type(node).__name__} at {part!r} ({path})")
    last = parts[-1]
    if isinstance(node, list) and last.lstrip("-").isdigit():
        node[int(last)] = value
    else:
        node[last] = value


def _safe_calc(expr: str) -> Any:
    """Arithmetic-only replacement for the reference's ``calc``->eval resolver
    (main.py:8) — no arbitrary code execution."""
    tree = ast.parse(expr, mode="eval")
    allowed = (
        ast.Expression, ast.BinOp, ast.UnaryOp, ast.Constant, ast.Add, ast.Sub,
        ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow, ast.USub, ast.UAdd,
    )
    for node in ast.walk(tree):
        if not isinstance(node, allowed):
            raise ValueError(f"disallowed expression in calc resolver: {expr!r}")
    return eval(compile(tree, "<calc>", "eval"))  # noqa: S307 - AST-validated


def _resolve_value(val: str, root: dict):
    """Resolve interpolations inside one string; full-string references keep
    their native type."""
    m = _INTERP.fullmatch(val.strip())
    if m:
        return _resolve_token(m.group(1), root)

    def sub(match):
        return str(_resolve_token(match.group(1), root))

    return _INTERP.sub(sub, val)


def _resolve_token(token: str, root: dict):
    if token.startswith("calc:"):
        expr = token[len("calc:"):].strip()
        if (expr.startswith("'") and expr.endswith("'")) or (
            expr.startswith('"') and expr.endswith('"')
        ):
            expr = expr[1:-1]
        # inner interpolations first
        expr = _INTERP.sub(lambda m: str(_resolve_token(m.group(1), root)), expr)
        return _safe_calc(expr)
    return _resolve_node(_get_path(root, token), root)


def _resolve_node(node: Any, root: dict):
    if isinstance(node, str) and "${" in node:
        return _resolve_value(node, root)
    return node


def resolve_interpolations(cfg: dict) -> dict:
    """Fixed-point resolution of all ``${...}`` strings in the tree."""

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, str) and "${" in node:
            out = _resolve_value(node, cfg)
            # resolved value may itself contain interpolations
            return walk(out) if isinstance(out, (str, dict, list)) and out != node else out
        return node

    prev = None
    current = cfg
    for _ in range(10):
        current = walk(current)
        if current == prev:
            break
        prev = current
    return current


_SCI_FLOAT = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _parse_override_value(raw: str) -> Any:
    # YAML 1.1 parses exponent-without-dot ('1e-4') as a string; treat it as
    # a float like Hydra/OmegaConf do
    if _SCI_FLOAT.match(raw.strip()):
        return float(raw)
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def load_config(
    config_dir: str,
    config_name: str = "base",
    overrides: list[str] | None = None,
) -> dict:
    with open(os.path.join(config_dir, f"{config_name}.yaml")) as fh:
        cfg: dict = yaml.safe_load(fh) or {}

    defaults = cfg.pop("defaults", [])
    group_choice: dict[str, str] = {}
    for entry in defaults:
        if isinstance(entry, dict):
            group_choice.update({str(k): str(v) for k, v in entry.items()})

    # CLI group overrides (bare `group=name` where configs/<group>/ exists)
    kv_overrides: list[tuple[str, Any, bool]] = []
    for ov in overrides or []:
        additive = ov.startswith("+")
        ov_body = ov[1:] if additive else ov
        if "=" not in ov_body:
            raise ValueError(f"override must be key=value: {ov}")
        key, raw = ov_body.split("=", 1)
        if key in group_choice or (
            "." not in key and os.path.isdir(os.path.join(config_dir, key))
        ):
            group_choice[key] = raw
        else:
            kv_overrides.append((key, _parse_override_value(raw), additive))

    for group, name in group_choice.items():
        path = os.path.join(config_dir, group, f"{name}.yaml")
        with open(path) as fh:
            node = yaml.safe_load(fh) or {}
        cfg[group] = _deep_merge(cfg.get(group) or {}, node)

    for key, value, _ in kv_overrides:
        _set_path(cfg, key, value)

    return resolve_interpolations(cfg)


def save_config(cfg: dict, path: str) -> None:
    with open(path, "w") as fh:
        yaml.safe_dump(_strip_objects(cfg), fh, sort_keys=False)


def _strip_objects(node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _strip_objects(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_strip_objects(v) for v in node]
    if isinstance(node, (str, int, float, bool)) or node is None:
        return node
    return repr(node)


def locate(target: str):
    """Resolve a dotted path to an object (hydra.utils.get_method semantics).

    Imports the longest importable module prefix, then walks the remaining
    segments as attributes — so both ``pkg.mod.Class`` and
    ``pkg.mod.Class.classmethod`` targets resolve.
    """
    parts = target.split(".")
    module = None
    import_err: Exception | None = None
    for split in range(len(parts) - 1, 0, -1):
        try:
            module = importlib.import_module(".".join(parts[:split]))
            break
        except ImportError as exc:
            import_err = exc
    if module is None:
        raise ImportError(f"cannot locate {target!r}: {import_err}")
    obj = module
    for attr in parts[split:]:
        try:
            obj = getattr(obj, attr)
        except AttributeError as exc:
            raise ImportError(f"cannot locate {target!r}: {exc}") from exc
    return obj


def instantiate(node: Any, **extra):
    """Build objects from ``_target_`` nodes, recursively by default."""
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    if not isinstance(node, dict):
        return node
    recursive = node.get("_recursive_", True)
    kwargs = {}
    for k, v in node.items():
        if k in ("_target_", "_recursive_"):
            continue
        kwargs[k] = instantiate(v) if recursive else v
    kwargs.update(extra)
    if "_target_" in node:
        cls = locate(node["_target_"])
        return cls(**kwargs)
    return kwargs
