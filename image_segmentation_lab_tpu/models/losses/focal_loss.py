"""Sigmoid focal loss (Lin et al., ICCV 2017: "Focal Loss for Dense
Object Detection").

Beyond-reference addition (the reference lab ships CE/Dice/Tversky/
Lovász) following the mmseg FocalLoss conventions: sigmoid-only,
one-hot targets over the prediction channels, ``alpha``-balanced
``(1-p_t)^gamma`` modulation on a numerically-stable BCE-with-logits,
per-class ``class_weight``, ``ignore_index`` via a validity mask folded
into the reduction weight.  Channels-last: pred (N,H,W,C),
target (N,H,W) int.  All math is elementwise VPU work in f32.
"""

from __future__ import annotations

import jax.nn
import jax.numpy as jnp

from ...core.registry_hub import LOSS
from .utils import get_class_weight, weight_reduce_loss


def sigmoid_focal_loss(pred, one_hot_target, gamma=2.0, alpha=0.5):
    """Element-wise focal term on logits (no reduction): BCE(pred, t) ·
    (α·t + (1-α)·(1-t)) · (1-p_t)^γ, computed in f32 with the stable
    ``max(x,0) - x·t + log1p(e^{-|x|})`` BCE form."""
    x = pred.astype(jnp.float32)
    t = one_hot_target.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    one_minus_pt = (1.0 - p) * t + p * (1.0 - t)
    focal_weight = (alpha * t + (1.0 - alpha) * (1.0 - t)) \
        * one_minus_pt ** gamma
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return bce * focal_weight


@LOSS.register()
class FocalLoss:
    def __init__(self,
                 use_sigmoid=True,
                 gamma=2.0,
                 alpha=0.5,
                 reduction="mean",
                 class_weight=None,
                 loss_weight=1.0,
                 loss_name="loss_focal"):
        assert use_sigmoid is True, "only sigmoid focal loss is supported"
        assert reduction in ("none", "mean", "sum")
        self.gamma = float(gamma)
        self.alpha = float(alpha)
        self.reduction = reduction
        self.class_weight = get_class_weight(class_weight)
        self.loss_weight = loss_weight
        self._loss_name = loss_name

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=255, **kwargs):
        assert reduction_override in (None, "none", "mean", "sum")
        reduction = reduction_override or self.reduction
        C = pred.shape[-1]
        flat = pred.reshape(-1, C)
        t = target.reshape(-1)
        valid = (t != ignore_index)
        one_hot = jax.nn.one_hot(jnp.clip(t, 0, C - 1), C,
                                 dtype=jnp.float32)
        loss = sigmoid_focal_loss(flat, one_hot, self.gamma, self.alpha)

        final_weight = jnp.ones((1, C), jnp.float32)
        if weight is not None:
            w = jnp.asarray(weight, jnp.float32).reshape(-1)
            final_weight = final_weight * w[:, None]
        if self.class_weight is not None:
            final_weight = final_weight * jnp.asarray(self.class_weight,
                                                      jnp.float32)[None, :]
        final_weight = final_weight * valid[:, None].astype(jnp.float32)
        final_weight = jnp.broadcast_to(final_weight, loss.shape)
        loss = weight_reduce_loss(loss, final_weight, reduction, avg_factor)
        return self.loss_weight * loss

    @property
    def loss_name(self):
        return self._loss_name
