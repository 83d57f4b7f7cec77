"""Config-driven weight initialization.

Parity target: reference ``core/initialize/weight_init.py:17-486``: the
INITIALIZERS registry (ConstantInit/XavierInit/NormalInit/TruncNormalInit/
UniformInit/KaimingInit/Caffe2XavierInit/PretrainedInit) and the
``initialize(module, init_cfg)`` dispatcher with layer-matching and
``override`` targeting of named submodules.

Functional redesign: torch mutates ``module.weight`` in place; here
``initialize(params, init_cfg, rng)`` returns a **new params pytree** with
matching leaves regenerated.  Layer matching works on leaf structure instead
of python class names:

* ``Conv*``   → leaves named ``weight`` with ndim ≥ 3 (channels-last kernels)
* ``Linear``  → ``weight`` with ndim == 2
* norm types  → ``weight``/``bias`` with ndim == 1 living beside running
  statistics (norm affine params)

which is equivalent because the primitive wrappers (models/basic) are the only
param-creating modules in the framework.

Note: most init parity is already *baked in* at construction time (ConvModule
self-init, head conv_seg NormalInit, backbone defaults — see each module);
this post-hoc system serves config-specified ``init_cfg`` overrides and
``Pretrained`` loading, mirroring how the reference's ``init_weights``
cascade finally applies (base_module.py:47-68).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..registry_hub import INITIALIZERS
from . import init_functions as F

PathT = Tuple[str, ...]

# ---------------------------------------------------------------------------
# Init-info tracking (reference base_module.py:16 ``_params_init_info`` +
# weight_init.py:76-77 ``update_init_info``): records, per param path, which
# initializer last touched it.  torch hangs this state off module objects;
# here params are plain pytrees, so it is a process-level ledger that
# ``initialize``/initializer calls populate and ``dump_init_info`` reports.
# ---------------------------------------------------------------------------
_INIT_INFO: Dict[str, str] = {}


def update_init_info(path, init_info: str) -> None:
    """Record that the param at ``path`` (tuple or dotted str) was
    initialized by ``init_info``."""
    key = ".".join(path) if isinstance(path, (tuple, list)) else str(path)
    _INIT_INFO[key] = init_info


def get_init_info() -> Dict[str, str]:
    return dict(_INIT_INFO)


def reset_init_info() -> None:
    _INIT_INFO.clear()


def dump_init_info(logger=print) -> None:
    """Log every tracked param's initializer (reference
    base_module.py:70-93 ``init_weights`` debug dump)."""
    for name in sorted(_INIT_INFO):
        logger(f"{name} - {_INIT_INFO[name]}")


def flatten_params(params) -> Dict[PathT, Any]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        out[keys] = leaf
    return out


def unflatten_params(flat: Dict[PathT, Any]):
    tree: Dict[str, Any] = {}
    for path, leaf in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return tree


_CONV_LAYERS = {"Conv", "Conv1d", "Conv2d", "Conv3d", "_ConvND",
                "Conv2dAdaptivePadding"}
_LINEAR_LAYERS = {"Linear"}
_NORM_LAYERS = {"_BatchNorm", "BatchNorm", "BatchNorm1d", "BatchNorm2d",
                "BatchNorm3d", "SyncBatchNorm", "GroupNorm", "LayerNorm",
                "LayerNorm2d", "InstanceNorm", "InstanceNorm1d",
                "InstanceNorm2d", "InstanceNorm3d"}


def _leaf_kind(path: PathT, leaf) -> Optional[str]:
    """Classify a param leaf as conv/linear/norm weight or bias."""
    name = path[-1]
    if name == "weight":
        if leaf.ndim >= 3:
            return "conv"
        if leaf.ndim == 2:
            return "linear"
        if leaf.ndim == 1:
            return "norm"
    elif name == "bias":
        return "bias"
    return None


def _layer_matches(kind: str, owner_bias_of: Optional[str],
                   layers: Optional[List[str]]) -> bool:
    if layers is None:
        return True
    wanted = set()
    for l in layers:
        if l in _CONV_LAYERS:
            wanted.add("conv")
        elif l in _LINEAR_LAYERS:
            wanted.add("linear")
        elif l in _NORM_LAYERS:
            wanted.add("norm")
        else:
            wanted.add(l)
    if kind == "bias":
        return owner_bias_of in wanted
    return kind in wanted


class BaseInit:
    """Common machinery: layer filter + bias handling
    (reference weight_init.py:17-44)."""

    def __init__(self, *, bias: float = 0, bias_prob: Optional[float] = None,
                 layer: Optional[Union[str, List[str]]] = None):
        if bias_prob is not None:
            bias = F.bias_init_with_prob(bias_prob)
        self.bias = bias
        self.layer = [layer] if isinstance(layer, str) else layer

    def weight_fn(self):  # -> (key, shape, dtype) -> array
        raise NotImplementedError

    def _get_init_info(self) -> str:
        attrs = ", ".join(f"{k}={v}" for k, v in sorted(vars(self).items())
                          if not k.startswith("_"))
        return f"{type(self).__name__}({attrs})"

    def __call__(self, params, rng):
        flat = flatten_params(params)
        # owner kind per module path, to scope bias re-init to matched layers
        owner_kind = {p[:-1]: _leaf_kind(p, l) for p, l in flat.items()
                      if p[-1] == "weight"}
        new = {}
        wfn = self.weight_fn()
        for path, leaf in flat.items():
            kind = _leaf_kind(path, leaf)
            if kind is None:
                new[path] = leaf
                continue
            if kind == "bias":
                if _layer_matches("bias", owner_kind.get(path[:-1]), self.layer) \
                        and owner_kind.get(path[:-1]) is not None:
                    new[path] = jnp.full(leaf.shape, self.bias, leaf.dtype)
                    update_init_info(path, self._get_init_info())
                else:
                    new[path] = leaf
            elif _layer_matches(kind, None, self.layer):
                rng, sub = jax.random.split(rng)
                new[path] = wfn(sub, leaf.shape, leaf.dtype)
                update_init_info(path, self._get_init_info())
            else:
                new[path] = leaf
        return unflatten_params(new)


@INITIALIZERS.register("Constant")
class ConstantInit(BaseInit):
    def __init__(self, val: float, **kwargs):
        super().__init__(**kwargs)
        self.val = val

    def weight_fn(self):
        return F.constant_(self.val)


@INITIALIZERS.register("Xavier")
class XavierInit(BaseInit):
    def __init__(self, gain: float = 1, distribution: str = "normal", **kwargs):
        super().__init__(**kwargs)
        self.gain, self.distribution = gain, distribution

    def weight_fn(self):
        return F.xavier_(self.gain, self.distribution)


@INITIALIZERS.register("Normal")
class NormalInit(BaseInit):
    def __init__(self, mean: float = 0, std: float = 1, **kwargs):
        super().__init__(**kwargs)
        self.mean, self.std = mean, std

    def weight_fn(self):
        return F.normal_(self.mean, self.std)


@INITIALIZERS.register("TruncNormal")
class TruncNormalInit(BaseInit):
    def __init__(self, mean: float = 0, std: float = 1,
                 a: float = -2, b: float = 2, **kwargs):
        super().__init__(**kwargs)
        self.mean, self.std, self.a, self.b = mean, std, a, b

    def weight_fn(self):
        return F.trunc_normal_(self.mean, self.std, self.a, self.b)


@INITIALIZERS.register("Uniform")
class UniformInit(BaseInit):
    def __init__(self, a: float = 0, b: float = 1, **kwargs):
        super().__init__(**kwargs)
        self.a, self.b = a, b

    def weight_fn(self):
        return F.uniform_(self.a, self.b)


@INITIALIZERS.register("Kaiming")
class KaimingInit(BaseInit):
    def __init__(self, a: float = 0, mode: str = "fan_out",
                 nonlinearity: str = "relu",
                 distribution: str = "normal", **kwargs):
        super().__init__(**kwargs)
        self.a, self.mode = a, mode
        self.nonlinearity, self.distribution = nonlinearity, distribution

    def weight_fn(self):
        return F.kaiming_(self.a, self.mode, self.nonlinearity,
                          self.distribution)


@INITIALIZERS.register("Caffe2Xavier")
class Caffe2XavierInit(KaimingInit):
    def __init__(self, **kwargs):
        super().__init__(a=1, mode="fan_in", nonlinearity="leaky_relu",
                         distribution="uniform", **kwargs)


@INITIALIZERS.register("Pretrained")
class PretrainedInit:
    """Load pretrained weights (reference weight_init.py:348-383).

    ``checkpoint`` is a path saved by this framework's ``save_model``/
    ``save_checkpoint``; ``prefix`` selects a sub-tree (e.g. ``'backbone.'``).
    """

    def __init__(self, checkpoint: str, prefix: Optional[str] = None,
                 map_location: str = "cpu"):
        self.checkpoint = checkpoint
        self.prefix = prefix
        self.map_location = map_location

    def __call__(self, params, rng=None):
        from .checkpoint import load_checkpoint_to_params
        out = load_checkpoint_to_params(params, self.checkpoint,
                                        prefix=self.prefix)
        info = f"PretrainedInit: load from {self.checkpoint}"
        for path in flatten_params(out):
            update_init_info(path, info)
        return out


def initialize_from_network_cfg(params, network_cfg, rng):
    """Apply a network config's ``pretrained``/``init_cfg`` hooks to params.

    The reference applies these through the recursive ``init_weights``
    cascade at module construction (base_module.py:47-68, encoder_decoder.py
    :43-63); here they are applied once to the params pytree after
    ``model.init``:

    * model-level ``pretrained`` (path) → Pretrained over the whole tree;
    * model-level ``init_cfg`` → ``initialize``;
    * backbone-level ``init_cfg`` / ``pretrained`` → applied to the
      ``backbone`` subtree (supports prefix-filtered checkpoints).

    Remote checkpoint URLs (``torchvision://…``, ``open-mmlab://…``) are not
    downloadable here; they raise with a pointer to the torch-checkpoint
    converter instead of silently training from random init.
    """
    def _as_init(pretrained, init_cfg):
        if pretrained:
            p = str(pretrained)
            if "://" in p:
                raise FileNotFoundError(
                    f"pretrained='{p}' is a remote locator; download the "
                    f"torch checkpoint and convert it with "
                    f"tools/convert_torch_checkpoint.py, then point "
                    f"`pretrained` at the converted file")
            return dict(type="Pretrained", checkpoint=p)
        return init_cfg

    model_init = _as_init(network_cfg.get("pretrained"),
                          network_cfg.get("init_cfg"))
    if model_init is not None:
        rng, sub = jax.random.split(rng)
        params = initialize(params, model_init, sub)

    backbone_cfg = network_cfg.get("backbone") or {}
    bb_init = _as_init(backbone_cfg.get("pretrained"),
                       backbone_cfg.get("init_cfg"))
    if bb_init is not None and "backbone" in params:
        rng, sub = jax.random.split(rng)
        params = dict(params)
        params["backbone"] = initialize(params["backbone"], bb_init, sub)
    return params


def _subtree_paths(flat, name: str):
    """Resolve an override ``name`` to param paths.

    The reference's override targets ``getattr(module, name)`` — a direct
    attribute of the module being initialized (weight_init.py:486+
    _initialize_override).  Resolution order here:

    1. dotted names ('decode_head.conv_seg') anchor at the tree root;
    2. a bare name matching a TOP-LEVEL child wins (the direct-attribute
       semantics — 'conv1' on a backbone tree targets the stem conv, NOT
       every bottleneck's conv1);
    3. otherwise a deeper subtree is accepted only when the anchor is
       UNIQUE — an ambiguous name (e.g. 'conv_seg' with decode + aux
       heads both present) raises instead of silently re-initializing
       several unrelated submodules.
    """
    comps = tuple(name.split("."))
    k = len(comps)
    if k > 1 or any(p and p[0] == name for p in flat):
        return {p for p in flat if p[:k] == comps}
    anchors = set()
    matches = set()
    for p in flat:
        for i in range(len(p) - k + 1):
            if p[i:i + k] == comps:
                anchors.add(p[:i + k])
                matches.add(p)
                break
    if len(anchors) > 1:
        raise ValueError(
            f"override name '{name}' is ambiguous — it matches "
            f"{sorted('.'.join(a) for a in anchors)}; use a dotted path")
    return matches


def initialize(params, init_cfg, rng) -> Any:
    """Apply ``init_cfg`` (dict or list of dicts) to a params pytree.

    Mirrors reference ``initialize`` (weight_init.py:386-486) including the
    ``override`` mechanism: override entries re-initialize only the named
    submodule subtree (wholemodule semantics).
    """
    if init_cfg is None:
        return params
    cfgs = init_cfg if isinstance(init_cfg, list) else [init_cfg]
    for cfg in cfgs:
        cfg = copy.deepcopy(cfg)
        if not isinstance(cfg, dict) or "type" not in cfg:
            raise TypeError(f"init_cfg must be dict(s) with `type`, got {cfg}")
        override = cfg.pop("override", None)
        builder = INITIALIZERS.get(cfg.pop("type"))
        func = builder(**cfg)
        rng, sub = jax.random.split(rng)
        params = func(params, sub)

        if override is not None:
            overrides = override if isinstance(override, list) else [override]
            for ov in overrides:
                ov = copy.deepcopy(ov)
                name = ov.pop("name")
                if "type" in ov:
                    ov_builder = INITIALIZERS.get(ov.pop("type"))
                    ov_func = ov_builder(**ov)
                else:
                    ov_func = func
                flat = flatten_params(params)
                target = _subtree_paths(flat, name)
                sub_flat = {p: l for p, l in flat.items() if p in target}
                if not sub_flat:
                    raise RuntimeError(
                        f"override name '{name}' matches no param path")
                rng, sub = jax.random.split(rng)
                sub_new = flatten_params(
                    ov_func(unflatten_params(sub_flat), sub))
                flat.update(sub_new)
                params = unflatten_params(flat)
    return params
