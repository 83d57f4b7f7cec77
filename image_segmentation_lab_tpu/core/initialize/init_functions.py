"""Raw initializer factories.

Parity target: reference ``core/initialize/init_functions.py:39-181``
(constant/xavier/normal/trunc_normal/uniform/kaiming/caffe2_xavier +
``bias_init_with_prob``).  torch mutates module weights in place; here each
function returns a JAX initializer ``(key, shape, dtype) -> array`` computing
fans from the **channels-last kernel layout** (spatial..., in/groups, out):

* ``fan_in  = prod(spatial) * shape[-2]``
* ``fan_out = prod(spatial) * shape[-1]``

which matches torch's ``_calculate_fan_in_and_fan_out`` on the equivalent
OIHW tensor, so initial weight distributions are identical.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _fans(shape):
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


def calculate_gain(nonlinearity: str, param=None) -> float:
    """torch.nn.init.calculate_gain parity."""
    linear_fns = {"linear", "conv1d", "conv2d", "conv3d",
                  "conv_transpose1d", "conv_transpose2d", "conv_transpose3d",
                  "sigmoid"}
    if nonlinearity in linear_fns:
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        negative_slope = 0.01 if param is None else param
        return math.sqrt(2.0 / (1 + negative_slope ** 2))
    if nonlinearity == "selu":
        return 3.0 / 4
    raise ValueError(f"Unsupported nonlinearity {nonlinearity}")


def constant_(val: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, val, dtype)
    return init


def normal_(mean: float = 0.0, std: float = 1.0) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)
    return init


def trunc_normal_(mean: float = 0.0, std: float = 1.0,
                  a: float = -2.0, b: float = 2.0) -> Callable:
    """Truncated normal on [a, b] (absolute bounds, torch semantics)."""
    def init(key, shape, dtype=jnp.float32):
        lo = (a - mean) / std
        hi = (b - mean) / std
        return mean + std * jax.random.truncated_normal(key, lo, hi, shape, dtype)
    return init


def uniform_(a: float = 0.0, b: float = 1.0) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=a, maxval=b)
    return init


def xavier_(gain: float = 1.0, distribution: str = "normal") -> Callable:
    assert distribution in ("normal", "uniform")

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        if distribution == "normal":
            return std * jax.random.normal(key, shape, dtype)
        bound = math.sqrt(3.0) * std
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def kaiming_(a: float = 0.0, mode: str = "fan_out",
             nonlinearity: str = "relu",
             distribution: str = "normal") -> Callable:
    """Kaiming init; defaults match the reference helper
    (init_functions.py kaiming_init: mode='fan_out', relu, normal)."""
    assert mode in ("fan_in", "fan_out")
    assert distribution in ("normal", "uniform")

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        fan = fan_in if mode == "fan_in" else fan_out
        gain = calculate_gain(nonlinearity, a)
        std = gain / math.sqrt(fan)
        if distribution == "normal":
            return std * jax.random.normal(key, shape, dtype)
        bound = math.sqrt(3.0) * std
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def caffe2_xavier_() -> Callable:
    """mmcv caffe2 'xavier': kaiming uniform fan_in / leaky_relu a=1."""
    return kaiming_(a=1, mode="fan_in", nonlinearity="leaky_relu",
                    distribution="uniform")


def bias_init_with_prob(prior_prob: float) -> float:
    """Bias value giving sigmoid output = prior_prob
    (reference init_functions.py)."""
    return float(-np.log((1 - prior_prob) / prior_prob))
