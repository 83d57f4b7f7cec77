"""Tversky loss (reference ``models/losses/tversky_loss.py``).

Per-class TP/FP/FN formulation with ``alpha + beta == 1`` assert
(reference :51-68, :107).  Channels-last: pred (N,H,W,C), target (N,H,W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.registry_hub import LOSS
from .utils import get_class_weight, weighted_loss


@weighted_loss
def tversky_loss(pred, target, valid_mask, alpha=0.3, beta=0.7, smooth=1,
                 class_weight=None, ignore_index=255):
    num_classes = pred.shape[-1]
    total_loss = 0.0
    for i in range(num_classes):
        if i != ignore_index:
            loss_i = binary_tversky_loss(
                pred[..., i], target[..., i], valid_mask=valid_mask,
                alpha=alpha, beta=beta, smooth=smooth, reduction="none")
            if class_weight is not None:
                loss_i = loss_i * class_weight[i]
            total_loss = total_loss + loss_i
    return total_loss / num_classes


@weighted_loss
def binary_tversky_loss(pred, target, valid_mask, alpha=0.3, beta=0.7,
                        smooth=1):
    N = pred.shape[0]
    pred = pred.reshape(N, -1).astype(jnp.float32)
    target = target.reshape(N, -1).astype(jnp.float32)
    valid_mask = valid_mask.reshape(N, -1).astype(jnp.float32)
    TP = jnp.sum(pred * target * valid_mask, axis=1)
    FP = jnp.sum(pred * (1 - target) * valid_mask, axis=1)
    FN = jnp.sum((1 - pred) * target * valid_mask, axis=1)
    tversky = (TP + smooth) / (TP + alpha * FP + beta * FN + smooth)
    return 1 - tversky


@LOSS.register()
class TverskyLoss:
    """TverskyLoss (reference tversky_loss.py:71-148)."""

    def __init__(self,
                 smooth=1,
                 class_weight=None,
                 loss_weight=1.0,
                 ignore_index=255,
                 alpha=0.3,
                 beta=0.7,
                 loss_name="loss_tversky"):
        self.smooth = smooth
        self.class_weight = get_class_weight(class_weight)
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        assert (alpha + beta == 1.0), "Sum of alpha and beta but be 1.0!"
        self.alpha = alpha
        self.beta = beta
        self._loss_name = loss_name

    def __call__(self, pred, target, **kwargs):
        class_weight = (jnp.asarray(self.class_weight, jnp.float32)
                        if self.class_weight is not None else None)
        pred = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        num_classes = pred.shape[-1]
        one_hot_target = jax.nn.one_hot(
            jnp.clip(target, 0, num_classes - 1), num_classes,
            dtype=jnp.float32)
        valid_mask = (target != self.ignore_index).astype(jnp.int32)
        return self.loss_weight * tversky_loss(
            pred, one_hot_target,
            valid_mask=valid_mask,
            alpha=self.alpha, beta=self.beta, smooth=self.smooth,
            class_weight=class_weight,
            ignore_index=self.ignore_index)

    @property
    def loss_name(self):
        return self._loss_name
