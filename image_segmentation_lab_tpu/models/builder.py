"""Model-side builders.

Parity target: reference ``models/builder.py`` — the 11 model registries
(:29-40, created centrally in ``core/registry_hub``) and the ``build_*``
family (:45-424).  Registered factories are linen Module classes; configs are
the same ``dict(type=..., **kwargs)`` dicts the reference uses, so reference
network configs instantiate unchanged.

torch's ``requires_grad`` norm flag maps to the ``trainable`` field of our
norm wrappers (frozen params land in the ``frozen_params`` collection — see
``models/basic/param_utils.py``).
"""

from __future__ import annotations

import copy
import re
from collections.abc import Mapping
from typing import Any, Dict, Optional, Tuple

from ..core.registry_hub import (ACTIVATION, BACKBONE, CONVOLUTION, DECODEHEAD,
                                 DROPOUT, LOSS, NECK, NORMALIZATION, PADDING,
                                 PLUGINS, SEGMENTOR)
from ..registry import Register

# modules buildable through build_module_from_cfg (reference models/builder.py:363-406)
_MODULE = (BACKBONE, NECK, DECODEHEAD, LOSS)

def _plain(obj):
    """Recursively convert Mapping (incl. flax FrozenDict fields) → dict."""
    if isinstance(obj, Mapping):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_plain(v) for v in obj)
    return obj




def build_conv_layer(cfg: Optional[Dict], *args, **kwargs):
    """Build a convolution layer; ``cfg=None`` → Conv2d default
    (reference models/builder.py:45-76)."""
    if cfg is None:
        cfg_ = dict(type="Conv2d")
    else:
        if not isinstance(cfg, Mapping) or "type" not in cfg:
            raise KeyError(f'cfg must be a dict containing "type", got {cfg}')
        cfg_ = _plain(cfg)
    layer_type = cfg_.pop("type")
    conv_layer = CONVOLUTION.get(layer_type)
    return conv_layer(*args, **kwargs, **cfg_)


def infer_norm_abbr(class_name: str) -> str:
    """Infer the abbreviated prefix for a norm layer name
    (reference ``infer_bn_abbr`` models/builder.py:79-125)."""
    name = class_name.lower()
    if "batch" in name:
        return "bn"
    if "group" in name:
        return "gn"
    if "layer" in name:
        return "ln"
    if "instance" in name:
        return "in"
    return "norm_layer"


def build_norm_layer(cfg: Dict, num_features: int,
                     postfix: Any = "") -> Tuple[str, Any]:
    """Build a norm layer, returning ``(name, layer)``.

    Mirrors reference models/builder.py:128-180: ``requires_grad`` controls
    parameter freezing (→ ``trainable``), ``eps`` defaults to 1e-5, GroupNorm
    requires ``num_groups`` and receives channels as ``num_channels``.
    """
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise KeyError(f'cfg must be a dict containing "type", got {cfg}')
    cfg_ = _plain(cfg)
    layer_type = cfg_.pop("type")
    norm_layer = NORMALIZATION.get(layer_type)
    abbr = infer_norm_abbr(norm_layer.__name__)
    assert isinstance(postfix, (int, str))
    name = abbr + str(postfix)

    requires_grad = cfg_.pop("requires_grad", True)
    cfg_.setdefault("eps", 1e-5)
    if abbr == "gn":
        assert "num_groups" in cfg_, "GroupNorm cfg needs `num_groups`"
        layer = norm_layer(num_channels=num_features, trainable=requires_grad,
                           **cfg_)
    else:
        layer = norm_layer(num_features, trainable=requires_grad, **cfg_)
    return name, layer


def build_activation_layer(cfg: Dict):
    """Build an activation module (reference models/builder.py:183-205)."""
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise KeyError(f'cfg must be a dict containing "type", got {cfg}')
    cfg_ = _plain(cfg)
    return ACTIVATION.get(cfg_.pop("type"))(**cfg_)


def build_padding_layer(cfg: Dict, *args, **kwargs):
    """Build a padding module (reference models/builder.py:208-232)."""
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise KeyError(f'cfg must be a dict containing "type", got {cfg}')
    cfg_ = _plain(cfg)
    padding_type = cfg_.pop("type")
    return PADDING.get(padding_type)(*args, **kwargs, **cfg_)


def build_dropout(cfg: Dict):
    """Build a dropout module (reference models/builder.py:235-256)."""
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise KeyError(f'cfg must be a dict containing "type", got {cfg}')
    cfg_ = _plain(cfg)
    return DROPOUT.get(cfg_.pop("type"))(**cfg_)


def build_loss(cfg: Dict):
    """Build a loss callable (reference models/builder.py:262-283)."""
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise KeyError(f'cfg must be a dict containing "type", got {cfg}')
    cfg_ = _plain(cfg)
    return LOSS.get(cfg_.pop("type"))(**cfg_)


def infer_plugin_abbr(class_name: str) -> str:
    """CamelCase → snake_case (reference models/builder.py:286-326)."""

    def _camel2snack(word):
        word = re.sub(r"([A-Z]+)", r"_\1", word).lower()
        word = re.sub(r"^_", "", word)
        word = re.sub(r"_+", "_", word)
        return word

    return _camel2snack(class_name)


def build_plugin_layer(cfg: Dict, postfix: Any = "",
                       **kwargs) -> Tuple[str, Any]:
    """Build a plugin layer, returning ``(name, layer)``
    (reference models/builder.py:329-360)."""
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise KeyError(f'cfg must be a dict containing "type", got {cfg}')
    cfg_ = _plain(cfg)
    layer_type = cfg_.pop("type")
    plugin_layer = PLUGINS.get(layer_type)
    abbr = infer_plugin_abbr(plugin_layer.__name__)
    assert isinstance(postfix, (int, str))
    name = abbr + str(postfix)
    layer = plugin_layer(**kwargs, **cfg_)
    return name, layer


def build_module_from_cfg(cfg: Dict, registry: Register,
                          default_args: Optional[Dict] = None):
    """Build a backbone/neck/decode-head/loss from cfg.

    Mirrors reference models/builder.py:363-406 including the registry
    restriction to the ``_MODULE`` tuple (:382).
    """
    if not isinstance(cfg, Mapping):
        raise TypeError(f"cfg must be a dict, but got {type(cfg)}")
    if "type" not in cfg and (default_args is None or "type" not in default_args):
        raise KeyError(f'`cfg` or `default_args` must contain the key "type", '
                       f"but got {cfg}\n{default_args}")
    if registry not in _MODULE:
        raise TypeError(
            f"registry must be one of {tuple(r.name for r in _MODULE)}, "
            f"but got {registry.name}")
    args = _plain(cfg)
    if default_args is not None:
        for name, value in default_args.items():
            args.setdefault(name, value)
    obj_type = args.pop("type")
    obj_cls = registry.get(obj_type) if isinstance(obj_type, str) else obj_type
    return obj_cls(**args)


def build_segmentor(cfg: Dict):
    """Build a segmentor (reference models/builder.py:409-424)."""
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise KeyError(f'cfg must be a dict containing "type", got {cfg}')
    cfg_ = _plain(cfg)
    return SEGMENTOR.get(cfg_.pop("type"))(**cfg_)


__all__ = [
    "ACTIVATION", "CONVOLUTION", "DROPOUT", "NORMALIZATION", "PADDING",
    "PLUGINS", "BACKBONE", "NECK", "DECODEHEAD", "SEGMENTOR", "LOSS",
    "build_conv_layer", "build_norm_layer", "build_activation_layer",
    "build_padding_layer", "build_dropout", "build_loss",
    "build_plugin_layer", "build_module_from_cfg", "build_segmentor",
    "infer_norm_abbr", "infer_plugin_abbr",
]
