"""Cross-entropy losses.

Parity target: reference ``models/losses/cross_entropy_loss.py`` (306 LoC):
softmax CE (:23-74), sigmoid BCE with one-hot expansion + ignore mask
(:77-164), mask CE (:167-203), the ``use_sigmoid``/``use_mask`` switches,
file-loadable ``class_weight``, ``avg_non_ignore`` averaging semantics and
the ``loss_name`` property.

Layout: predictions are channels-last ``(N, H, W, C)``; labels ``(N, H, W)``
int32.  Ignore handling is mask-based (no boolean indexing) so everything
jits: ignored positions contribute exact zeros and — matching torch's
``F.cross_entropy(reduction='none')`` — still count in the denominator unless
``avg_non_ignore`` is set.  Log-softmax/logits math runs in float32 under
bf16 compute.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...core.registry_hub import LOSS
from .utils import get_class_weight, weight_reduce_loss


def cross_entropy(pred,
                  label,
                  weight=None,
                  class_weight=None,
                  reduction="mean",
                  avg_factor=None,
                  ignore_index=-100,
                  avg_non_ignore=False):
    """Softmax CE on (N,H,W,C) logits (reference cross_entropy_loss.py:23-74)."""
    pred = pred.astype(jnp.float32)
    valid = label != ignore_index
    safe_label = jnp.where(valid, label, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(pred, axis=-1)
    loss = -jnp.take_along_axis(logp, safe_label[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)
        loss = loss * cw[safe_label]
    loss = jnp.where(valid, loss, 0.0)

    if (avg_factor is None) and avg_non_ignore and reduction == "mean":
        avg_factor = jnp.sum(valid)
    if weight is not None:
        weight = weight.astype(jnp.float32)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def _expand_onehot_labels(labels, label_weights, num_classes, ignore_index):
    """One-hot expansion with validity masking
    (reference cross_entropy_loss.py:77-105)."""
    valid_mask = (labels >= 0) & (labels != ignore_index)
    safe = jnp.where(valid_mask, labels, 0).astype(jnp.int32)
    bin_labels = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
    bin_labels = bin_labels * valid_mask[..., None]
    valid_f = jnp.broadcast_to(valid_mask[..., None].astype(jnp.float32),
                               bin_labels.shape)
    if label_weights is None:
        bin_label_weights = valid_f
    else:
        bin_label_weights = jnp.broadcast_to(
            label_weights[..., None], bin_labels.shape) * valid_f
    return bin_labels, bin_label_weights, valid_f


def _bce_with_logits(pred, target, pos_weight=None):
    """torch F.binary_cross_entropy_with_logits, reduction='none'."""
    log_p = jax.nn.log_sigmoid(pred)
    log_1mp = jax.nn.log_sigmoid(-pred)
    if pos_weight is not None:
        return -(pos_weight * target * log_p + (1 - target) * log_1mp)
    return -(target * log_p + (1 - target) * log_1mp)


def binary_cross_entropy(pred,
                         label,
                         weight=None,
                         reduction="mean",
                         avg_factor=None,
                         class_weight=None,
                         ignore_index=-100,
                         avg_non_ignore=False,
                         **kwargs):
    """Sigmoid BCE (reference cross_entropy_loss.py:100-164).

    ``pred`` (N,H,W,1) with binary label, or (N,H,W,C) with index labels
    which get one-hot expanded.
    """
    pred = pred.astype(jnp.float32)
    if pred.ndim == label.ndim + 1 and pred.shape[-1] == 1:
        # binary segmentation: squeeze the channel
        pred = pred[..., 0]
    if pred.ndim != label.ndim:
        label, weight, valid_mask = _expand_onehot_labels(
            label, weight, pred.shape[-1], ignore_index)
    else:
        valid_mask = ((label >= 0) & (label != ignore_index)).astype(jnp.float32)
        weight = valid_mask if weight is None else weight * valid_mask
    if reduction == "mean" and avg_factor is None and avg_non_ignore:
        avg_factor = jnp.sum(valid_mask)

    pw = jnp.asarray(class_weight, jnp.float32) if class_weight is not None else None
    loss = _bce_with_logits(pred, label.astype(jnp.float32), pos_weight=pw)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def mask_cross_entropy(pred,
                       target,
                       label,
                       reduction="mean",
                       avg_factor=None,
                       class_weight=None,
                       ignore_index=None,
                       **kwargs):
    """Per-mask BCE on the channel selected by ``label``
    (reference cross_entropy_loss.py:167-203).  pred: (N,H,W,C)."""
    assert ignore_index is None, "BCE loss does not support ignore_index"
    assert reduction == "mean" and avg_factor is None
    num_rois = pred.shape[0]
    inds = jnp.arange(num_rois)
    pred_slice = pred[inds, ..., label]  # (N,H,W)
    loss = _bce_with_logits(pred_slice.astype(jnp.float32),
                            target.astype(jnp.float32))
    if class_weight is not None:
        # torch's F.binary_cross_entropy_with_logits(weight=...) rescales
        # the WHOLE per-element loss (positive and negative terms alike),
        # with trailing-dim broadcasting — NOT pos_weight semantics
        loss = loss * jnp.asarray(class_weight, jnp.float32)
    return jnp.mean(loss)


@LOSS.register()
class CrossEntropyLoss:
    """CrossEntropyLoss (reference cross_entropy_loss.py:206-306)."""

    def __init__(self,
                 use_sigmoid: bool = False,
                 use_mask: bool = False,
                 reduction: str = "mean",
                 class_weight=None,
                 loss_weight: float = 1.0,
                 loss_name: str = "loss_ce",
                 avg_non_ignore: bool = False):
        assert not (use_sigmoid and use_mask)
        self.use_sigmoid = use_sigmoid
        self.use_mask = use_mask
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.class_weight = get_class_weight(class_weight)
        self.avg_non_ignore = avg_non_ignore
        self._loss_name = loss_name
        if self.use_sigmoid:
            self.cls_criterion = binary_cross_entropy
        elif self.use_mask:
            self.cls_criterion = mask_cross_entropy
        else:
            self.cls_criterion = cross_entropy

    def __call__(self,
                 cls_score,
                 label,
                 weight=None,
                 avg_factor=None,
                 reduction_override: Optional[str] = None,
                 ignore_index: int = -100,
                 **kwargs):
        assert reduction_override in (None, "none", "mean", "sum")
        reduction = reduction_override or self.reduction
        loss_cls = self.loss_weight * self.cls_criterion(
            cls_score,
            label,
            weight,
            class_weight=self.class_weight,
            reduction=reduction,
            avg_factor=avg_factor,
            avg_non_ignore=self.avg_non_ignore,
            ignore_index=ignore_index,
            **kwargs)
        return loss_cls

    @property
    def loss_name(self) -> str:
        return self._loss_name
