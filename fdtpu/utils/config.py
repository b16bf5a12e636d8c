"""Minimal Hydra-style config composition (YAML groups + CLI overrides).

The reference's experiment surface is Hydra (`/root/reference/cmd/conf/**`,
SURVEY.md §5.6).  This module reproduces the patterns the CLIs rely on with
plain YAML + dicts:

* a root config with a ``defaults`` list selecting group files
  (``score_model: default`` → ``configs/score_model/default.yaml``);
* CLI overrides: ``group=name`` swaps a group file, ``a.b=v`` sets a value,
  ``+a.b=v`` adds a new key;
* ``${path.to.key}`` interpolation (e.g. ``fourier_noise_scaling:
  ${fourier_transform}``);
* config persistence into the run dir for later reconstruction
  (reference cmd/train.py:40-43).

No ``_target_`` instantiation: the CLIs map group names to classes via
explicit registries — simpler and jit-friendlier than reflective imports.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import yaml

_INTERP = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")


def _load_yaml(path: Path) -> dict[str, Any]:
    with open(path) as f:
        data = yaml.safe_load(f)
    return data or {}


_RUN_ID = re.compile(r"\d{8}_\d{6}")


def _parse_value(raw: str) -> Any:
    value = yaml.safe_load(raw)
    # YAML 1.1 reads digit groups with underscores ("20260816_201855", a
    # timestamp run id from Trainer's strftime("%Y%m%d_%H%M%S")) as ints with
    # the underscores stripped; keep the original string only for run-id
    # shaped tokens so numeric overrides like num_samples=1_000 still parse
    # as numbers.
    if isinstance(value, (int, float)) and _RUN_ID.fullmatch(raw):
        return raw
    return value


def _step(node: Any, k: str) -> Any:
    if isinstance(node, list):
        return node[int(k)]
    return node[k]


def _set_path(cfg: dict, dotted: str, value: Any, allow_new: bool) -> None:
    keys = dotted.split(".")
    node: Any = cfg
    for k in keys[:-1]:
        if isinstance(node, list):
            node = node[int(k)]
            continue
        if k not in node or not isinstance(node[k], (dict, list)):
            if not allow_new:
                raise KeyError(f"Unknown config path: {dotted}")
            node[k] = {}
        node = node[k]
    last = keys[-1]
    if isinstance(node, list):
        node[int(last)] = value
        return
    if last not in node and not allow_new:
        raise KeyError(
            f"Unknown config key: {dotted} (prefix with '+' to add new keys)"
        )
    node[last] = value


def _get_path(cfg: dict, dotted: str) -> Any:
    node: Any = cfg
    for k in dotted.split("."):
        node = _step(node, k)
    return node


def _resolve_interpolations(cfg: dict | list, root: dict) -> None:
    items = enumerate(cfg) if isinstance(cfg, list) else cfg.items()
    for k, v in list(items):
        if isinstance(v, (dict, list)):
            _resolve_interpolations(v, root)
        elif isinstance(v, str):
            m = _INTERP.match(v)
            if m:
                cfg[k] = _get_path(root, m.group(1))


def compose_config(
    config_dir: Path | str,
    config_name: str,
    overrides: list[str] | None = None,
) -> dict[str, Any]:
    """Compose ``<config_dir>/<config_name>.yaml`` with its defaults groups
    and apply CLI overrides."""
    config_dir = Path(config_dir)
    root = _load_yaml(config_dir / f"{config_name}.yaml")
    defaults = root.pop("defaults", [])
    overrides = list(overrides or [])

    # Group selections may be overridden on the CLI (``datamodule=nasa``).
    group_choice: dict[str, str] = {}
    for entry in defaults:
        if entry == "_self_":
            continue
        assert isinstance(entry, dict) and len(entry) == 1, entry
        group, name = next(iter(entry.items()))
        group_choice[group] = name

    value_overrides: list[tuple[str, Any, bool]] = []
    subgroup_choice: dict[tuple[str, str], str] = {}
    for ov in overrides:
        allow_new = ov.startswith("+")
        ov_body = ov[1:] if allow_new else ov
        key, _, raw = ov_body.partition("=")
        if key in group_choice and "." not in key:
            group_choice[key] = raw
        elif (
            key.count(".") == 1
            and (config_dir / key.replace(".", "/") / f"{raw}.yaml").exists()
        ):
            # Nested group override, e.g. score_model.noise_scheduler=vesde.
            group, sub_group = key.split(".")
            subgroup_choice[(group, sub_group)] = raw
        else:
            value_overrides.append((key, _parse_value(raw), allow_new))

    for group, name in group_choice.items():
        group_cfg = _load_yaml(config_dir / group / f"{name}.yaml")
        sub_defaults = group_cfg.pop("defaults", [])
        for entry in sub_defaults:
            assert isinstance(entry, dict) and len(entry) == 1
            sub_group, sub_name = next(iter(entry.items()))
            sub_name = subgroup_choice.get((group, sub_group), sub_name)
            group_cfg[sub_group] = _load_yaml(
                config_dir / group / sub_group / f"{sub_name}.yaml"
            )
        group_cfg["name"] = name
        root[group] = group_cfg

    for key, value, allow_new in value_overrides:
        _set_path(root, key, value, allow_new)

    _resolve_interpolations(root, root)
    return root


def flatten_config(cfg: dict, prefix: str = "") -> dict[str, Any]:
    """Flatten nested config for logging (reference extraction.py:20-55)."""
    flat: dict[str, Any] = {}
    for k, v in cfg.items():
        if isinstance(v, dict):
            flat.update(flatten_config(v))
        else:
            flat[k] = v
    return flat


def dict_to_str(d: dict[str, Any]) -> str:
    """Pretty one-per-line dict rendering (reference extraction.py:101-121)."""
    if not d:
        return ""
    max_len = max(len(str(k)) for k in d)
    lines = []
    for k, v in d.items():
        if isinstance(v, list) and len(v) > 3:
            v = v[:3] + ["..."]
        lines.append(f"\t {str(k): <{max_len + 5}} : \t  {v}")
    return "\n".join(lines)


def save_config(cfg: dict[str, Any], path: Path | str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def load_config(path: Path | str) -> dict[str, Any]:
    return _load_yaml(Path(path))
