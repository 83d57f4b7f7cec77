"""Mixed-precision dtype policy.

TPU-native replacement for the reference's fp16 machinery
(``core/mixed_precision/fp16_utils.py:65-436``: @auto_fp16/@force_fp32
decorators + LossScaler).  On TPU the natural mixed-precision mode is
**bfloat16 compute with float32 parameters** — bf16 has fp32's exponent range
so no loss scaling is needed; the GradScaler/LossScaler subsystem therefore
collapses into this small policy module:

* params are stored fp32 (master weights);
* layers cast inputs/params to ``compute_dtype`` at call time;
* normalization statistics and losses accumulate in fp32.

``cast_tensor_type`` is the pytree-recursive dtype cast, the analog of
reference fp16_utils.py:23-62.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        return cast_tensor_type(tree, dst_type=self.compute_dtype)

    def cast_to_param(self, tree):
        return cast_tensor_type(tree, dst_type=self.param_dtype)

    def cast_to_output(self, tree):
        return cast_tensor_type(tree, dst_type=self.output_dtype)


_POLICIES = {
    "fp32": Policy(jnp.float32, jnp.float32, jnp.float32),
    "float32": Policy(jnp.float32, jnp.float32, jnp.float32),
    "bf16": Policy(jnp.float32, jnp.bfloat16, jnp.float32),
    "bfloat16": Policy(jnp.float32, jnp.bfloat16, jnp.float32),
    # fully-half (params too) — for inference-only deployments
    "bf16_full": Policy(jnp.bfloat16, jnp.bfloat16, jnp.bfloat16),
}

_current_policy: Policy = _POLICIES["fp32"]


def get_policy() -> Policy:
    return _current_policy


def set_policy(policy) -> Policy:
    """Set the global dtype policy.  Accepts a name or a Policy instance.

    ``set_policy('bf16')`` is the analog of the reference schedule flag
    ``amp=True`` (configs/schedule/kvasir_training_schedule.py:22).
    """
    global _current_policy
    if isinstance(policy, str):
        policy = _POLICIES[policy]
    if not isinstance(policy, Policy):
        raise TypeError(f"policy must be a str or Policy, got {type(policy)}")
    _current_policy = policy
    return policy


def amp_policy(amp: bool) -> Policy:
    """Map the reference's boolean ``amp`` schedule flag to a policy."""
    return set_policy("bf16" if amp else "fp32")


@contextlib.contextmanager
def policy_scope(policy):
    """Temporarily switch the global policy (test helper)."""
    global _current_policy
    prev = _current_policy
    set_policy(policy)
    try:
        yield _current_policy
    finally:
        _current_policy = prev


def cast_tensor_type(inputs, src_type=None, dst_type=None):
    """Recursively cast floating-point leaves of a pytree to ``dst_type``.

    Equivalent of reference fp16_utils.py:23-62.  Non-float leaves (int masks,
    bool) are left untouched; if ``src_type`` is given only leaves of that
    dtype are converted.
    """
    assert dst_type is not None

    def _cast(x):
        if not isinstance(x, (jnp.ndarray, jax.Array)):
            return x
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        if src_type is not None and x.dtype != src_type:
            return x
        return x.astype(dst_type)

    return jax.tree_util.tree_map(_cast, inputs)
