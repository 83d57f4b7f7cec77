"""Normalization primitives (registered in NORMALIZATION).

Parity target: reference ``models/basic/normalization.py:18-103`` which
registers torch BatchNorm1d/2d/3d (+``BatchNorm`` alias), SyncBatchNorm,
GroupNorm, LayerNorm, InstanceNorm variants and a custom channels-first
``LayerNorm2d``.  Differences by design:

* **Channels-last**: all wrappers normalize over the trailing channel axis of
  NHWC/NWC/NDHWC tensors (TPU-native layout).
* **SyncBatchNorm ≡ BatchNorm** under ``pjit``: with the batch sharded over
  the ``data`` mesh axis, ``jnp.mean`` over the batch axis is a *global*
  mean — XLA inserts the cross-replica reduction automatically, so the
  reference's separate SyncBN machinery (normalization.py:38-40 +
  ``revert_sync_batchnorm`` utils/operations.py:24-72) collapses into one
  class.  An explicit ``axis_name`` is honored for ``shard_map``/``pmap`` use.
* Statistics always accumulate in float32 even under bf16 compute.
* The short config aliases ``BN``/``SyncBN``/``GN``/``LN``/``IN`` used by
  reference configs but left unregistered there (SURVEY.md §8.4) are
  registered here.
* torch's ``requires_grad`` norm-freezing (models/builder.py:150-160) maps to
  ``trainable=False`` → affine params go to the ``frozen_params`` collection.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import NORMALIZATION
from .param_utils import FROZEN_COLLECTION, create_param


def _ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def _zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class _BatchNorm(nn.Module):
    """Channels-last BatchNorm with torch-compatible semantics.

    ``momentum`` follows torch: ``running = (1-m)*running + m*batch`` with
    the *unbiased* batch variance feeding the running estimate and the biased
    variance used for normalization (torch.nn.BatchNorm semantics).
    ``force_eval`` pins the layer to running statistics regardless of the
    ``train`` flag — the analog of reference ``norm_eval`` re-freezing
    (resnet.py:680-689).
    """

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    track_running_stats: bool = True
    trainable: bool = True
    force_eval: bool = False
    axis_name: Optional[str] = None
    # optional affine-init overrides (e.g. zero-init-residual sets gamma=0)
    weight_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert x.shape[-1] == self.num_features, (
            f"expected {self.num_features} channels, got {x.shape[-1]}")
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable("batch_stats", "running_mean",
                                lambda: jnp.zeros((self.num_features,), jnp.float32))
        ra_var = self.variable("batch_stats", "running_var",
                               lambda: jnp.ones((self.num_features,), jnp.float32))

        use_batch_stats = train and not self.force_eval
        if not self.track_running_stats:
            # torch: with track_running_stats=False BN normalizes with the
            # CURRENT batch statistics in eval mode too (the running
            # zeros/ones are never updated and must not be used)
            use_batch_stats = True
        if self.is_initializing():
            use_batch_stats = False

        if use_batch_stats:
            mean = jnp.mean(x32, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(x32), axis=reduce_axes)
            n = x32.size // self.num_features
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if self.track_running_stats and self.is_mutable_collection("batch_stats"):
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x32 - mean) * inv
        if self.affine:
            weight = create_param(self, "weight", self.weight_init or _ones,
                                  (self.num_features,), self.trainable,
                                  dtype=jnp.float32)
            bias = create_param(self, "bias", self.bias_init or _zeros,
                                (self.num_features,), self.trainable,
                                dtype=jnp.float32)
            y = y * weight + bias
        return y.astype(orig_dtype)


@NORMALIZATION.register("BatchNorm2d", aliases=("BatchNorm", "BatchNorm1d",
                                                "BatchNorm3d", "BN"))
class BatchNorm2d(_BatchNorm):
    pass


@NORMALIZATION.register("SyncBatchNorm", aliases=("SyncBN",))
class SyncBatchNorm(_BatchNorm):
    """Alias of BatchNorm — sync is automatic under pjit (see module doc)."""


@NORMALIZATION.register("GroupNorm", aliases=("GN",))
class GroupNorm(nn.Module):
    """torch-compatible GroupNorm over channels-last input."""

    num_groups: int
    num_channels: int
    eps: float = 1e-5
    affine: bool = True
    trainable: bool = True
    weight_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        C = self.num_channels
        G = self.num_groups
        assert C % G == 0 and x.shape[-1] == C
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        shape = x32.shape
        xg = x32.reshape(shape[0], -1, G, C // G)  # (N, spatial, G, C/G)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 3), keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + self.eps)).reshape(shape)
        if self.affine:
            weight = create_param(self, "weight", self.weight_init or _ones,
                                  (C,), self.trainable, dtype=jnp.float32)
            bias = create_param(self, "bias", self.bias_init or _zeros,
                                (C,), self.trainable, dtype=jnp.float32)
            y = y * weight + bias
        return y.astype(orig_dtype)


@NORMALIZATION.register("LayerNorm", aliases=("LN",))
class LayerNorm(nn.Module):
    """torch-compatible LayerNorm over the trailing ``normalized_shape`` dims."""

    normalized_shape: Union[int, Sequence[int]]
    eps: float = 1e-5
    elementwise_affine: bool = True
    trainable: bool = True
    weight_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        shape = ((self.normalized_shape,) if isinstance(self.normalized_shape, int)
                 else tuple(self.normalized_shape))
        axes = tuple(range(x.ndim - len(shape), x.ndim))
        assert x.shape[x.ndim - len(shape):] == shape
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.var(x32, axis=axes, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.elementwise_affine:
            weight = create_param(self, "weight", self.weight_init or _ones,
                                  shape, self.trainable, dtype=jnp.float32)
            bias = create_param(self, "bias", self.bias_init or _zeros,
                                shape, self.trainable, dtype=jnp.float32)
            y = y * weight + bias
        return y.astype(orig_dtype)


@NORMALIZATION.register("LayerNorm2d")
class LayerNorm2d(LayerNorm):
    """Reference's channel-first LayerNorm2d (normalization.py:74-103).

    In NHWC the channel axis is already last, so this is LayerNorm over C —
    the permute dance of the reference disappears by layout choice.
    """


@NORMALIZATION.register("InstanceNorm2d", aliases=("InstanceNorm",
                                                   "InstanceNorm1d",
                                                   "InstanceNorm3d", "IN"))
class InstanceNorm2d(nn.Module):
    """torch-compatible InstanceNorm (per-sample, per-channel spatial norm)."""

    num_features: int
    eps: float = 1e-5
    affine: bool = False
    trainable: bool = True
    weight_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert x.shape[-1] == self.num_features
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))  # spatial dims
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.var(x32, axis=axes, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            weight = create_param(self, "weight", self.weight_init or _ones,
                                  (self.num_features,), self.trainable,
                                  dtype=jnp.float32)
            bias = create_param(self, "bias", self.bias_init or _zeros,
                                (self.num_features,), self.trainable,
                                dtype=jnp.float32)
            y = y * weight + bias
        return y.astype(orig_dtype)
