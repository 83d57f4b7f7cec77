"""Mixed-precision decorators (API parity shims).

Parity target: reference ``core/mixed_precision/fp16_utils.py``:
``@auto_fp16``/``@force_fp32`` method decorators (:65-244),
``wrap_fp16_model`` (:255-286), ``patch_norm_fp32`` (:289-306) and the
dynamic ``LossScaler`` (:332-436).

On TPU these collapse into the bf16 dtype policy (``policy.py``):

* ``auto_fp16``  → cast designated float args to the policy compute dtype
  (bf16 under amp) before the call;
* ``force_fp32`` → cast them to float32 (loss/metric code);
* ``wrap_fp16_model`` → ``set_policy('bf16')`` (layers read the policy);
* ``patch_norm_fp32`` → built in: every norm in models/basic already
  computes statistics in fp32 regardless of compute dtype;
* ``LossScaler`` → intentionally absent: bf16 shares float32's exponent
  range, so gradient under/overflow scaling is unnecessary.  A no-op
  ``LossScaler`` is provided so reference-derived call sites keep working.

These decorators exist for users porting reference code; the framework's own
modules never need them.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax.numpy as jnp

from .policy import cast_tensor_type, get_policy, set_policy


def _cast_args(args, kwargs, apply_to: Optional[Sequence[str]], dst_dtype,
               func):
    import inspect
    if apply_to is None:
        cast_a = tuple(cast_tensor_type(a, dst_type=dst_dtype) for a in args)
        cast_k = {k: cast_tensor_type(v, dst_type=dst_dtype)
                  for k, v in kwargs.items()}
        return cast_a, cast_k
    names = list(inspect.signature(func).parameters)
    cast_a = []
    for i, a in enumerate(args):
        name = names[i] if i < len(names) else None
        cast_a.append(cast_tensor_type(a, dst_type=dst_dtype)
                      if name in apply_to else a)
    cast_k = {k: (cast_tensor_type(v, dst_type=dst_dtype)
                  if k in apply_to else v) for k, v in kwargs.items()}
    return tuple(cast_a), cast_k


def auto_fp16(apply_to: Optional[Sequence[str]] = None,
              out_fp32: bool = False):
    """Cast designated args to the policy compute dtype (bf16 under amp)."""

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            dtype = get_policy().compute_dtype
            a, k = _cast_args(args, kwargs, apply_to, dtype, func)
            out = func(*a, **k)
            if out_fp32:
                out = cast_tensor_type(out, dst_type=jnp.float32)
            return out
        return wrapper

    return decorator


def force_fp32(apply_to: Optional[Sequence[str]] = None,
               out_fp16: bool = False):
    """Cast designated args to float32 (losses/metrics)."""

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            a, k = _cast_args(args, kwargs, apply_to, jnp.float32, func)
            out = func(*a, **k)
            if out_fp16:
                out = cast_tensor_type(out,
                                       dst_type=get_policy().compute_dtype)
            return out
        return wrapper

    return decorator


def wrap_fp16_model(model=None):
    """Enable mixed precision globally (reference fp16_utils.py:255-286)."""
    set_policy("bf16")
    return model


def patch_norm_fp32(module=None):
    """No-op: norms always accumulate statistics in fp32 here."""
    return module


class LossScaler:
    """No-op scaler (bf16 needs none — see module docstring)."""

    def __init__(self, init_scale: float = 2 ** 32, mode: str = "dynamic",
                 scale_factor: float = 2.0, scale_window: int = 1000):
        self.cur_scale = 1.0
        self.mode = mode

    def has_overflow(self, params) -> bool:
        return False

    def update_scale(self, overflow: bool) -> None:
        pass

    @property
    def loss_scale(self) -> float:
        return self.cur_scale

    def state_dict(self):
        return dict(cur_scale=self.cur_scale, mode=self.mode)

    def load_state_dict(self, state_dict):
        self.cur_scale = state_dict.get("cur_scale", 1.0)
