"""Pixel accuracy (reference ``models/losses/accuracy.py:6-92``).

Channels-last: pred (N,...,C) scores, target (N,...) int labels.  Returns
percentage (×100) with the reference's eps-guarded division.  Ignore handling
is mask-based (jit-safe) instead of boolean indexing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def accuracy(pred, target, topk=1, thresh=None, ignore_index=None):
    assert isinstance(topk, (int, tuple))
    return_single = isinstance(topk, int)
    topks = (topk,) if return_single else topk
    maxk = max(topks)
    if pred.shape[0] == 0:
        accu = [jnp.asarray(0.0) for _ in topks]
        return accu[0] if return_single else accu
    assert pred.ndim == target.ndim + 1
    assert maxk <= pred.shape[-1], (
        f"maxk {maxk} exceeds pred dimension {pred.shape[-1]}")

    pred = pred.astype(jnp.float32)
    # top-k over the channel axis → (maxk, N, ...)
    order = jnp.argsort(-pred, axis=-1)
    pred_label = jnp.moveaxis(order[..., :maxk], -1, 0)
    pred_value = jnp.moveaxis(jnp.take_along_axis(pred, order[..., :maxk],
                                                  axis=-1), -1, 0)
    correct = pred_label == target[None]
    if thresh is not None:
        correct = correct & (pred_value > thresh)
    if ignore_index is not None:
        valid = target != ignore_index
        correct = correct & valid[None]
        total = jnp.sum(valid) + _EPS
    else:
        total = float(np.prod(target.shape)) + _EPS
    res = []
    for k in topks:
        correct_k = jnp.sum(correct[:k].astype(jnp.float32)) + _EPS
        res.append(correct_k * 100.0 / total)
    return res[0] if return_single else res


class Accuracy:
    """Accuracy callable (reference accuracy.py:64-92)."""

    def __init__(self, topk=(1,), thresh=None, ignore_index=None):
        self.topk = topk
        self.thresh = thresh
        self.ignore_index = ignore_index

    def __call__(self, pred, target):
        return accuracy(pred, target, self.topk, self.thresh,
                        self.ignore_index)
