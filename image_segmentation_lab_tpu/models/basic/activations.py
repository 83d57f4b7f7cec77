"""Activation primitives (registered in ACTIVATION).

Parity target: reference ``models/basic/activations.py:17-44`` registers
ReLU/ReLU6/Sigmoid/LeakyReLU/Tanh/PReLU.  The reference *uses* but never
registers HSwish/HSigmoid/Swish (MobileNetV3, mobilenet_v3.py:150-204 —
SURVEY.md §8.3); they are registered here, plus GELU/SiLU for completeness.

All are stateless linen modules (PReLU carries a parameter) so the uniform
``(x, train=False)`` layer-call protocol holds across the framework.  The
``inplace`` torch flag is accepted and ignored — functional JAX has no
aliasing; XLA fuses these elementwise ops into neighboring convs for free.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import ACTIVATION
from .param_utils import create_param


@ACTIVATION.register("ReLU")
class ReLU(nn.Module):
    inplace: bool = False

    def __call__(self, x, train: bool = False):
        return jax.nn.relu(x)


@ACTIVATION.register("ReLU6")
class ReLU6(nn.Module):
    inplace: bool = False

    def __call__(self, x, train: bool = False):
        return jax.nn.relu6(x)


@ACTIVATION.register("Sigmoid")
class Sigmoid(nn.Module):
    def __call__(self, x, train: bool = False):
        return jax.nn.sigmoid(x)


@ACTIVATION.register("LeakyReLU")
class LeakyReLU(nn.Module):
    negative_slope: float = 0.01
    inplace: bool = False

    def __call__(self, x, train: bool = False):
        return jax.nn.leaky_relu(x, self.negative_slope)


@ACTIVATION.register("Tanh")
class Tanh(nn.Module):
    def __call__(self, x, train: bool = False):
        return jnp.tanh(x)


@ACTIVATION.register("PReLU")
class PReLU(nn.Module):
    """torch-compatible PReLU: learnable negative slope (init 0.25)."""

    num_parameters: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        alpha = create_param(
            self, "weight",
            lambda key, shape, dtype: jnp.full(shape, self.init, dtype),
            (self.num_parameters,), True)
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


@ACTIVATION.register("HSigmoid", aliases=("Hardsigmoid",))
class HSigmoid(nn.Module):
    """hard-sigmoid: clip((x + bias) / divisor, 0, 1); the (3, 6) default is
    torch Hardsigmoid == relu6(x+3)/6 (MobileNetV3 passes bias/divisor
    explicitly, reference mobilenet_v3.py:171)."""

    bias: float = 3.0
    divisor: float = 6.0
    inplace: bool = False

    def __call__(self, x, train: bool = False):
        return jnp.clip((x + self.bias) / self.divisor, 0.0, 1.0)


@ACTIVATION.register("HSwish", aliases=("Hardswish",))
class HSwish(nn.Module):
    """hard-swish: x * relu6(x + 3) / 6 (MobileNetV3)."""

    inplace: bool = False

    def __call__(self, x, train: bool = False):
        return x * (jax.nn.relu6(x + 3.0) / 6.0)


@ACTIVATION.register("Swish", aliases=("SiLU",))
class Swish(nn.Module):
    inplace: bool = False

    def __call__(self, x, train: bool = False):
        return jax.nn.silu(x)


@ACTIVATION.register("GELU")
class GELU(nn.Module):
    # torch serializes approximate as the strings 'none'/'tanh'; accept
    # both forms — the truthy string 'none' must mean EXACT gelu
    approximate: Any = False

    def __call__(self, x, train: bool = False):
        approx = self.approximate
        if isinstance(approx, str):
            assert approx in ("none", "tanh"), approx
            approx = approx == "tanh"
        return jax.nn.gelu(x, approximate=approx)


@ACTIVATION.register("Identity")
class Identity(nn.Module):
    def __call__(self, x, train: bool = False):
        return x
