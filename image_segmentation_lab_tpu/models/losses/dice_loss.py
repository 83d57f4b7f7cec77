"""Dice loss (reference ``models/losses/dice_loss.py``).

softmax → clamped one-hot → per-class binary dice over valid pixels with
``smooth``/``exponent`` (reference :23-58, :117-133).  Channels-last layout:
pred (N,H,W,C), target (N,H,W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.registry_hub import LOSS
from .utils import get_class_weight, weight_reduce_loss, weighted_loss


@weighted_loss
def dice_loss(pred, target, valid_mask, smooth=1, exponent=2,
              class_weight=None, ignore_index=255):
    """Mean over classes of per-image binary dice (reference dice_loss.py:23-45).

    pred: (N,H,W,C) probabilities; target: (N,H,W,C) one-hot;
    valid_mask: (N,H,W).
    """
    num_classes = pred.shape[-1]
    total_loss = 0.0
    for i in range(num_classes):
        if i != ignore_index:
            loss_i = binary_dice_loss(
                pred[..., i], target[..., i], valid_mask=valid_mask,
                smooth=smooth, exponent=exponent, reduction="none")
            if class_weight is not None:
                loss_i = loss_i * class_weight[i]
            total_loss = total_loss + loss_i
    return total_loss / num_classes


@weighted_loss
def binary_dice_loss(pred, target, valid_mask, smooth=1, exponent=2, **kwargs):
    """Per-image binary dice (reference dice_loss.py:48-58)."""
    N = pred.shape[0]
    pred = pred.reshape(N, -1).astype(jnp.float32)
    target = target.reshape(N, -1).astype(jnp.float32)
    valid_mask = valid_mask.reshape(N, -1).astype(jnp.float32)
    num = jnp.sum(pred * target * valid_mask, axis=1) * 2 + smooth
    den = jnp.sum(pred ** exponent + target ** exponent, axis=1) + smooth
    return 1 - num / den


@LOSS.register()
class DiceLoss:
    """DiceLoss (reference dice_loss.py:61-148)."""

    def __init__(self,
                 smooth=1,
                 exponent=2,
                 reduction="mean",
                 class_weight=None,
                 loss_weight=1.0,
                 ignore_index=255,
                 loss_name="loss_dice",
                 **kwargs):
        self.smooth = smooth
        self.exponent = exponent
        self.reduction = reduction
        self.class_weight = get_class_weight(class_weight)
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self._loss_name = loss_name

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        assert reduction_override in (None, "none", "mean", "sum")
        reduction = reduction_override or self.reduction
        # per-pixel sampler weights don't apply to the per-image dice
        # vector — mmseg's DiceLoss likewise swallows `weight`
        weight = None
        class_weight = (jnp.asarray(self.class_weight, jnp.float32)
                        if self.class_weight is not None else None)
        pred = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        num_classes = pred.shape[-1]
        one_hot_target = jax.nn.one_hot(
            jnp.clip(target, 0, num_classes - 1), num_classes,
            dtype=jnp.float32)
        valid_mask = (target != self.ignore_index).astype(jnp.int32)
        return self.loss_weight * dice_loss(
            pred, one_hot_target,
            weight=weight,
            valid_mask=valid_mask,
            reduction=reduction,
            avg_factor=avg_factor,
            smooth=self.smooth,
            exponent=self.exponent,
            class_weight=class_weight,
            ignore_index=self.ignore_index)

    @property
    def loss_name(self):
        return self._loss_name
