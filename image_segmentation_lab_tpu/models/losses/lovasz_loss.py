"""Lovász-Softmax / Lovász-hinge loss.

Parity target: reference ``models/losses/lovasz_loss.py`` (334 LoC):
``lovasz_grad`` cumulative jaccard (:26-38), binary hinge (:71-137) and
multi-class softmax (:140-233) variants, ``per_image``, ``classes`` in
{'all','present',list}, and the reduction='none' requirement when
``per_image=False`` (:280-282).

JAX redesign: the reference drops ignored pixels by boolean indexing, which
has data-dependent shape.  Here ignored pixels are kept but (a) given error
so low they sort to the *end* of the descending error order and (b) given
foreground 0 and error contribution 0 — prefix cumulative sums over valid
pixels are unchanged, so the loss is identical while remaining fully
jittable with static shapes.  'present'-class selection likewise becomes a
presence-weighted average instead of dynamic indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.registry_hub import LOSS
from .utils import get_class_weight, weight_reduce_loss

_NEG = -1e9  # sorts ignored pixels last in descending error order


def lovasz_grad(gt_sorted):
    """Gradient of the Lovász extension w.r.t. sorted errors
    (reference lovasz_loss.py:26-38)."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted, axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=0)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1.0)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]], axis=0)


def _lovasz_hinge_flat(logits, labels, valid):
    """Binary hinge on flat pixels; ``valid`` masks ignored pixels."""
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    errors = jnp.where(valid, errors, _NEG)
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = (labels * valid)[order]
    grad = lovasz_grad(gt_sorted)
    return jnp.sum(jax.nn.relu(errors_sorted) * grad)


def lovasz_hinge(logits, labels, classes="present", per_image=False,
                 class_weight=None, reduction="mean", avg_factor=None,
                 ignore_index=255, **kwargs):
    """Binary Lovász hinge (reference lovasz_loss.py:71-137).

    logits: (N,H,W) or (N,H,W,1); labels: (N,H,W) in {0,1} ∪ {ignore}.
    """
    if logits.ndim == 4:
        logits = logits[..., 0]
    logits = logits.astype(jnp.float32)
    labels_f = labels.astype(jnp.float32)
    valid = (labels != ignore_index).astype(jnp.float32)
    if per_image:
        loss = jax.vmap(_lovasz_hinge_flat)(
            logits.reshape(logits.shape[0], -1),
            labels_f.reshape(labels.shape[0], -1),
            valid.reshape(valid.shape[0], -1))
        return weight_reduce_loss(loss, None, reduction, avg_factor)
    return _lovasz_hinge_flat(logits.reshape(-1), labels_f.reshape(-1),
                              valid.reshape(-1))


def _lovasz_softmax_flat(probs, labels, valid, classes, class_weight):
    """probs: (P,C) softmax probabilities, labels: (P,), valid: (P,)."""
    C = probs.shape[-1]
    if classes == "all" or classes == "present":
        class_ids = list(range(C))
    else:
        class_ids = list(classes)
    losses = []
    weights = []
    for c in class_ids:
        fg = (labels == c).astype(jnp.float32) * valid
        errors = jnp.abs(fg - probs[:, c])
        errors = jnp.where(valid > 0, errors, _NEG)
        order = jnp.argsort(-errors)
        grad = lovasz_grad(fg[order])
        loss_c = jnp.sum(jnp.maximum(errors[order], 0.0) * grad)
        if class_weight is not None:
            loss_c = loss_c * class_weight[c]
        if classes == "present":
            present = (jnp.sum(fg) > 0).astype(jnp.float32)
            losses.append(loss_c * present)
            weights.append(present)
        else:
            losses.append(loss_c)
            weights.append(jnp.asarray(1.0, jnp.float32))
    losses = jnp.stack(losses)
    weights = jnp.stack(weights)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(weights), 1.0)


def lovasz_softmax(probs, labels, classes="present", per_image=False,
                   class_weight=None, reduction="mean", avg_factor=None,
                   ignore_index=255, **kwargs):
    """Multi-class Lovász-Softmax (reference lovasz_loss.py:140-233).

    probs: (N,H,W,C) softmax probabilities; labels: (N,H,W).
    """
    probs = probs.astype(jnp.float32)
    valid = (labels != ignore_index).astype(jnp.float32)
    N, H, W, C = probs.shape
    if per_image:
        loss = jax.vmap(
            lambda p, l, v: _lovasz_softmax_flat(p, l, v, classes,
                                                 class_weight)
        )(probs.reshape(N, -1, C), labels.reshape(N, -1), valid.reshape(N, -1))
        return weight_reduce_loss(loss, None, reduction, avg_factor)
    return _lovasz_softmax_flat(probs.reshape(-1, C), labels.reshape(-1),
                                valid.reshape(-1), classes, class_weight)


@LOSS.register()
class LovaszLoss:
    """LovaszLoss (reference lovasz_loss.py:237-334)."""

    def __init__(self,
                 loss_type="multi_class",
                 classes="present",
                 per_image=False,
                 reduction="mean",
                 class_weight=None,
                 loss_weight=1.0,
                 loss_name="loss_lovasz"):
        assert loss_type in ("binary", "multi_class")
        self.cls_criterion = (lovasz_hinge if loss_type == "binary"
                              else lovasz_softmax)
        assert classes in ("all", "present") or (
            isinstance(classes, (list, tuple))
            and all(isinstance(c, int) for c in classes))
        if not per_image:
            assert reduction == "none", (
                "reduction should be 'none' when per_image is False.")
        self.classes = classes
        self.per_image = per_image
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.class_weight = get_class_weight(class_weight)
        self._loss_name = loss_name

    def __call__(self, cls_score, label, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        assert reduction_override in (None, "none", "mean", "sum")
        reduction = reduction_override or self.reduction
        class_weight = (jnp.asarray(self.class_weight, jnp.float32)
                        if self.class_weight is not None else None)
        if self.cls_criterion is lovasz_softmax:
            cls_score = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
        return self.loss_weight * self.cls_criterion(
            cls_score, label, self.classes, self.per_image,
            class_weight=class_weight, reduction=reduction,
            avg_factor=avg_factor, **kwargs)

    @property
    def loss_name(self):
        return self._loss_name
