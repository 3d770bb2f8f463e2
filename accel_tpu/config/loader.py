"""Config system: attribute-dict defaults + YAML experiment overlay.

Mirrors the reference's easydict-based ``<net>/config/config.py`` +
``update_config(yaml_path)`` pattern (SURVEY.md L5 layer) and preserves its
cfg vocabulary (``network``, ``dataset``, ``TRAIN``, ``TEST``, ``SCALES``,
``PIXEL_MEANS`` ...) so reference experiment YAMLs translate 1:1.

Unlike the reference (one config module duplicated per network directory),
there is a single shared config with a ``network.name`` selector.
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

import yaml


class Config(dict):
    """A dict with attribute access and deep-merge update (easydict-alike)."""

    def __init__(self, d: Mapping[str, Any] | None = None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = self._wrap(v)

    @staticmethod
    def _wrap(v):
        if isinstance(v, Mapping) and not isinstance(v, Config):
            return Config(v)
        if isinstance(v, (list, tuple)):
            return type(v)(Config._wrap(x) for x in v)
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, self._wrap(value))

    def merge(self, other: Mapping[str, Any], strict: bool = True, _path: str = ""):
        """Deep-merge ``other`` into self.

        With ``strict=True`` (reference behaviour), a key in ``other`` that
        does not already exist raises — this catches typos in experiment
        yamls the same way the reference's update_config did.
        """
        for k, v in other.items():
            key_path = f"{_path}.{k}" if _path else str(k)
            if strict and k not in self:
                raise KeyError(f"unknown config key: {key_path}")
            if isinstance(v, Mapping) and isinstance(self.get(k), Config):
                self[k].merge(v, strict=strict, _path=key_path)
            else:
                self[k] = v
        return self

    def clone(self) -> "Config":
        return Config(copy.deepcopy(dict(self)))


def default_config() -> Config:
    from accel_tpu.config.defaults import make_defaults

    return make_defaults()


def update_config(cfg: Config, yaml_path: str, strict: bool = True) -> Config:
    """Overlay an experiment YAML onto ``cfg`` in place (reference name)."""
    with open(yaml_path) as f:
        overlay = yaml.safe_load(f) or {}
    cfg.merge(overlay, strict=strict)
    return cfg


def load_config(yaml_path: str | None = None, strict: bool = True) -> Config:
    cfg = default_config()
    if yaml_path is not None:
        update_config(cfg, yaml_path, strict=strict)
    return cfg
