"""Layered YAML configuration.

Mirrors the semantics of the reference config system
(`/root/reference/src/utils/configurator.py:62-118`): settings are merged in
the order

    overall.yaml  ->  dataset/<dataset>.yaml  ->  model/<MODEL>.yaml
                  ->  mg.yaml (only when mirror-gradient is enabled)
                  ->  external config dict (programmatic overrides)

with later layers winning.  List-valued entries named in the
``hyper_parameters`` key define the hyperparameter sweep axes consumed by
``quick_start`` (reference `quick_start.py:54-95`); ``seed`` is always added
as a sweep axis (reference `configurator.py:110-112`).

TPU-specific additions (no counterpart in the reference): ``mesh_shape``,
``mesh_axis_names``, ``param_dtype``/``compute_dtype`` and the on-device
sampler settings.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import yaml

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CONFIG_DIR = os.path.join(_PKG_DIR, "configs")

# YAML 1.1 parses `1e-4` as a string; install a resolver so scientific
# notation without a dot parses as float (reference `configurator.py:92-104`
# solves the same problem).
_FLOAT_RE = re.compile(
    r"""^(?:
        [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
       |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
       |\.[0-9_]+(?:[eE][-+][0-9]+)?
       |[-+]?\.(?:inf|Inf|INF)
       |\.(?:nan|NaN|NAN))$""",
    re.X,
)


class _FloatSafeLoader(yaml.SafeLoader):
    pass


_FloatSafeLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float", _FLOAT_RE, list("-+0123456789.")
)


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        out = yaml.load(f, Loader=_FloatSafeLoader)
    return out or {}


class Config:
    """Merged configuration with dict-like access.

    Args:
        model: model name, e.g. ``"SMORE"`` (case preserved for file lookup).
        dataset: dataset name, e.g. ``"baby"``.
        config_dict: highest-precedence programmatic overrides.
        mg: enable the mirror-gradient layer (``configs/mg.yaml``).
        config_dir: alternative configs directory (defaults to the package's
            bundled ``configs/``).
    """

    def __init__(
        self,
        model: str,
        dataset: str,
        config_dict: Optional[Dict[str, Any]] = None,
        mg: bool = False,
        config_dir: Optional[str] = None,
    ):
        self.config_dir = config_dir or _CONFIG_DIR
        self.final_config: Dict[str, Any] = {}
        self._load_files(model, dataset, mg)
        if config_dict:
            self.final_config.update(config_dict)
        self.final_config["model"] = model
        self.final_config["dataset"] = dataset
        self.final_config["mg"] = mg
        self._post_init()

    def _load_files(self, model: str, dataset: str, mg: bool) -> None:
        paths = [os.path.join(self.config_dir, "overall.yaml")]
        ds_path = os.path.join(self.config_dir, "dataset", f"{dataset}.yaml")
        if os.path.isfile(ds_path):
            paths.append(ds_path)
        model_path = os.path.join(self.config_dir, "model", f"{model}.yaml")
        if os.path.isfile(model_path):
            paths.append(model_path)
        if mg:
            paths.append(os.path.join(self.config_dir, "mg.yaml"))
        hyper_axes: list = []
        for p in paths:
            if not os.path.isfile(p):
                continue
            layer = load_yaml(p)
            # hyper_parameters accumulate across layers (union, order kept)
            for ax in layer.pop("hyper_parameters", []):
                if ax not in hyper_axes:
                    hyper_axes.append(ax)
            self.final_config.update(layer)
        self.final_config["hyper_parameters"] = hyper_axes

    def _post_init(self) -> None:
        cfg = self.final_config
        # seed always participates in the sweep (reference configurator.py:110-112)
        axes = cfg.get("hyper_parameters", [])
        if "seed" not in axes:
            axes = ["seed"] + list(axes)
        cfg["hyper_parameters"] = axes
        if not isinstance(cfg.get("seed", 999), list):
            cfg["seed"] = [cfg["seed"]]
        # direction of the validation metric (reference configurator.py:106-112)
        smaller_metrics = ["rmse", "mae", "logloss"]
        valid_metric = str(cfg.get("valid_metric", "Recall@20")).split("@")[0]
        cfg["valid_metric_bigger"] = valid_metric.lower() not in smaller_metrics
        cfg.setdefault("device", "tpu")
        cfg.setdefault("use_neighborhood_loss", False)
        cfg.setdefault("clip_grad_norm", None)
        cfg.setdefault("req_training", True)
        cfg.setdefault("mesh_shape", None)  # None => all devices on 'data'
        cfg.setdefault("mesh_axis_names", ["data", "model"])

    # -- dict-like interface ------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self.final_config.get(key, None)

    def __setitem__(self, key: str, value: Any) -> None:
        if not isinstance(key, str):
            raise TypeError("config key must be a string")
        self.final_config[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self.final_config

    def get(self, key: str, default: Any = None) -> Any:
        return self.final_config.get(key, default)

    def keys(self):
        return self.final_config.keys()

    def copy(self) -> "Config":
        new = object.__new__(Config)
        new.config_dir = self.config_dir
        new.final_config = dict(self.final_config)
        return new

    def __str__(self) -> str:
        lines = [f"{k} = {v}" for k, v in sorted(self.final_config.items())]
        return "\n".join(lines)

    __repr__ = __str__
