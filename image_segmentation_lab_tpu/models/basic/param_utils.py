"""Shared parameter-creation helpers for the primitive-op wrappers.

Two framework-wide conventions are established here:

1. **Torch-compatible default initialization** at the distribution level
   (kaiming-uniform fan-in for conv/linear weights, matching uniform bias) so
   that models built from reference configs start from statistically identical
   weights (reference relies on torch defaults wherever no init_cfg is given).

2. **Frozen parameters live in the ``frozen_params`` collection**, not in
   ``params``.  This is the TPU-native replacement for torch's
   ``requires_grad=False`` (used by reference ``build_norm_layer``
   models/builder.py:150-160 and ``_freeze_stages`` resnet.py:644-661): the
   train step differentiates only the ``params`` collection, so freezing is a
   structural property of the variable tree instead of a mutable flag — no
   optimizer masking needed and XLA sees frozen weights as constants.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.mixed_precision import get_policy

FROZEN_COLLECTION = "frozen_params"


def kaiming_uniform_torch(fan_in: int) -> Callable:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's conv/linear default."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def create_param(module: nn.Module,
                 name: str,
                 init_fn: Callable,
                 shape: Sequence[int],
                 trainable: bool = True,
                 dtype: Any = None) -> jnp.ndarray:
    """Create a parameter in ``params`` or ``frozen_params`` per ``trainable``."""
    dtype = dtype or get_policy().param_dtype
    if trainable:
        return module.param(name, init_fn, shape, dtype)
    var = module.variable(
        FROZEN_COLLECTION, name,
        lambda: init_fn(module.make_rng("params"), shape, dtype))
    return var.value


def compute_cast(*arrays):
    """Cast arrays to the policy compute dtype (bf16 under amp)."""
    dtype = get_policy().compute_dtype
    out = tuple(a.astype(dtype) if a is not None else None for a in arrays)
    return out if len(out) > 1 else out[0]
