"""Dropout primitives (registered in DROPOUT).

Parity target: reference ``models/basic/drop.py:18-83``: ``drop_path`` /
``DropPath`` (stochastic depth, per-sample residual drop) plus torch
Dropout/Dropout1d/2d/3d, AlphaDropout, FeatureAlphaDropout.

Randomness comes from the linen ``'dropout'`` RNG stream — the functional
analog of torch's global RNG state; training steps must supply
``rngs={'dropout': key}``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DROPOUT


def drop_path(x: jnp.ndarray, key, drop_prob: float = 0.0) -> jnp.ndarray:
    """Per-sample stochastic-depth drop (reference drop.py:18-33)."""
    if drop_prob == 0.0:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep_prob, shape).astype(x.dtype)
    return x / keep_prob * mask


@DROPOUT.register("DropPath")
class DropPath(nn.Module):
    drop_prob: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.drop_prob == 0.0:
            return x
        return drop_path(x, self.make_rng("dropout"), self.drop_prob)


class _Dropout(nn.Module):
    """Element-wise inverted dropout (torch.nn.Dropout semantics)."""

    p: float = 0.5
    inplace: bool = False

    # number of trailing dims (after batch) that share one mask value:
    # 0 → elementwise; 1 → whole channels dropped (channels-last layout).
    channel_wise: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.p == 0.0:
            return x
        keep = 1.0 - self.p
        if self.channel_wise:
            # drop entire channels: mask shaped (N, 1, ..., 1, C)
            shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        else:
            shape = x.shape
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


@DROPOUT.register("Dropout")
class Dropout(_Dropout):
    channel_wise: bool = False


@DROPOUT.register("Dropout2d", aliases=("Dropout1d", "Dropout3d"))
class Dropout2d(_Dropout):
    """Channel dropout: zeroes whole channels (torch Dropout2d on NCHW ≡
    dropping the trailing C axis in channels-last layout)."""

    channel_wise: bool = True


class _AlphaDropoutBase(nn.Module):
    """SELU-preserving alpha dropout (torch.nn.AlphaDropout semantics)."""

    p: float = 0.5
    inplace: bool = False
    channel_wise: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.p == 0.0:
            return x
        alpha = 1.6732632423543772
        scale = 1.0507009873554805
        alpha_p = -alpha * scale
        keep = 1.0 - self.p
        a = (keep + alpha_p ** 2 * keep * (1 - keep)) ** -0.5
        b = -a * alpha_p * (1 - keep)
        if self.channel_wise:
            shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        else:
            shape = x.shape
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return (a * jnp.where(mask, x, alpha_p) + b).astype(x.dtype)


@DROPOUT.register("AlphaDropout")
class AlphaDropout(_AlphaDropoutBase):
    channel_wise: bool = False


@DROPOUT.register("FeatureAlphaDropout")
class FeatureAlphaDropout(_AlphaDropoutBase):
    channel_wise: bool = True
