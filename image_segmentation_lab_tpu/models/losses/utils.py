"""Loss utilities.

Parity target: reference ``models/losses/utils.py``: ``get_class_weight``
(:10-25), ``reduce_loss`` (:28-45), ``weight_reduce_loss`` with avg_factor +
eps guard (:48-80), and the ``@weighted_loss`` decorator (:83-126).
All tensor math is jnp; reductions accumulate in float32.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def get_class_weight(class_weight):
    """Load class weights from a list / np file / pkl-json-yaml path
    (reference utils.py:10-25)."""
    if isinstance(class_weight, str):
        if class_weight.endswith(".npy"):
            class_weight = np.load(class_weight)
        else:
            from ...core.fileio import load
            class_weight = load(class_weight)
    return class_weight


def reduce_loss(loss, reduction: str):
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"invalid reduction {reduction}")


def weight_reduce_loss(loss, weight=None, reduction: str = "mean",
                       avg_factor=None):
    """Apply element-wise weight then reduce (reference utils.py:48-80)."""
    if weight is not None:
        assert weight.ndim == loss.ndim
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == "mean":
        return jnp.sum(loss) / (avg_factor + _EPS)
    if reduction != "none":
        raise ValueError('avg_factor can not be used with reduction="sum"')
    return loss


def weighted_loss(loss_func):
    """Decorator adding weight/reduction/avg_factor handling
    (reference utils.py:83-126)."""

    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction="mean",
                avg_factor=None, **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)

    return wrapper
