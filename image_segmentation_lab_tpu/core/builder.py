"""Core-side registries and the generic config-dict builder.

Parity with reference ``core/builder.py``:

* registries ``DATASET/INITIALIZERS/SAMPLER/OPTIMIZER/LR_SCHEDULER``
  (reference core/builder.py:15-19);
* ``build_from_cfg(cfg, registry, default_args)`` validating the ``type`` key
  and registry type (reference core/builder.py:22-64);
* ``build_optimizer(cfg, params)`` (reference core/builder.py:67-75) — here
  the registered factories return **optax gradient transformations** and the
  signature takes the model/params pytree for masked (frozen) updates.
"""

from __future__ import annotations

import copy
from collections.abc import Mapping
from typing import Any, Dict, Optional

from .registry_hub import (DATASET, INITIALIZERS, LR_SCHEDULER, OPTIMIZER,
                           SAMPLER)
from ..registry import Register



def _plain(obj):
    """Recursively convert Mapping (incl. flax FrozenDict fields) → dict."""
    if isinstance(obj, Mapping):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_plain(v) for v in obj)
    return obj


def build_from_cfg(cfg: Dict[str, Any],
                   registry: Register,
                   default_args: Optional[Dict[str, Any]] = None) -> Any:
    """Instantiate ``registry.get(cfg['type'])(**cfg_without_type, **defaults)``.

    Mirrors reference core/builder.py:22-64: ``cfg`` must be a dict with a
    ``type`` key; ``default_args`` fills in missing keys without overriding.
    """
    if not isinstance(cfg, Mapping):
        raise TypeError(f"cfg must be a dict, but got {type(cfg)}")
    if "type" not in cfg:
        if default_args is None or "type" not in default_args:
            raise KeyError(
                f'`cfg` or `default_args` must contain the key "type", '
                f"but got {cfg}\n{default_args}")
    if not isinstance(registry, Register):
        raise TypeError(
            f"registry must be a Register object, but got {type(registry)}")
    if not (isinstance(default_args, dict) or default_args is None):
        raise TypeError(
            f"default_args must be a dict or None, but got {type(default_args)}")

    args = _plain(cfg)
    if default_args is not None:
        for name, value in default_args.items():
            args.setdefault(name, value)

    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
    elif callable(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or callable, but got {type(obj_type)}")
    return obj_cls(**args)


def build_optimizer(cfg: Dict[str, Any], params: Any = None,
                    frozen_mask: Any = None):
    """Build an optax optimizer from a ``dict(type='SGD', lr=..., ...)`` cfg.

    Returns an ``optax.GradientTransformation``.  ``params`` is accepted for
    signature parity with the reference (core/builder.py:67-75) but unused —
    optax transformations are initialized separately with ``.init(params)``.
    """
    cfg = _plain(cfg)
    opt_type = cfg.pop("type")
    paramwise_cfg = cfg.pop("paramwise_cfg", None)
    if paramwise_cfg:
        from .optimizers.paramwise import build_paramwise_optimizer
        tx = build_paramwise_optimizer(opt_type, cfg, paramwise_cfg,
                                       OPTIMIZER)
    else:
        factory = OPTIMIZER.get(opt_type)
        tx = factory(**cfg)
    if frozen_mask is not None:
        import optax
        tx = optax.masked(tx, frozen_mask)
    return tx


__all__ = [
    "DATASET", "INITIALIZERS", "SAMPLER", "OPTIMIZER", "LR_SCHEDULER",
    "build_from_cfg", "build_optimizer",
]
