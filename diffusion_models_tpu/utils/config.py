"""YAML config loading + registry-based instantiation.

Mirrors the reference's two config mechanisms (SURVEY.md §5.6):
  1. argparse `--config` + `yaml.safe_load` with `unet:/diffusion:/trainer:/
     dataset:` sections (`train/train_ddpm.py:10-53`) — handled by
     `load_config` + the builder helpers in each train script.
  2. CompVis "target-string" instantiation (`ldm/util.py:78-93`) — replaced
     by an explicit REGISTRY: configs say `target: <registered-name>` and we
     look it up; no dynamic imports of arbitrary dotted paths.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import yaml

REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        REGISTRY[name] = fn
        return fn

    return deco


def load_config(path) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def instantiate_from_config(config: dict, **extra) -> Any:
    """{"target": <registry name>, "params": {...}} → instance."""
    if "target" not in config:
        raise KeyError("expected `target` key in config")
    target = config["target"]
    if target not in REGISTRY:
        raise KeyError(
            f"unknown target {target!r}; registered: {sorted(REGISTRY)}"
        )
    params = dict(config.get("params", {}))
    params.update(extra)
    return REGISTRY[target](**params)
