"""Pixel samplers (online hard example mining).

The reference declares a SAMPLER registry and a ``sampler`` hook on decode
heads (decode_head.py:136-139, :272-275) but ships **no implementation** —
``core/__init__.py`` even imports a nonexistent ``core.sampler`` module
(SURVEY.md §8.2).  This implements the standard OHEM pixel sampler (mmseg
semantics, selection over the whole flattened batch with
``batch_kept = min_kept * N``):

* with ``thresh``: keep valid pixels whose predicted ground-truth-class
  probability is below ``max(thresh, prob of the batch_kept-th easiest)``;
* without: keep the ``batch_kept`` highest-loss valid pixels of the batch.

Everything is mask-based top-k (jit-safe, static shapes).  One documented
divergence from mmseg: ties at the threshold keep *all* tied pixels (mask
compare) instead of an arbitrary sort-order subset of exactly
``batch_kept``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .registry_hub import SAMPLER


@SAMPLER.register()
class OHEMPixelSampler:
    def __init__(self, thresh: Optional[float] = None,
                 min_kept: int = 100000, context=None):
        assert min_kept > 1
        self.thresh = thresh
        self.min_kept = int(min_kept)

    def sample(self, head, seg_logit, seg_label):
        """seg_logit (N,H,W,C), seg_label (N,H,W) → weight (N,H,W) float.

        mmseg flattens the batch before selecting (batch_kept = min_kept*N
        over N*H*W pixels), so hard pixels concentrated in one image can
        consume the whole budget — matched here.
        """
        ignore_index = head.ignore_index
        N, H, W, C = seg_logit.shape
        P = N * H * W
        k = min(self.min_kept * N, P)
        logit = seg_logit.astype(jnp.float32).reshape(P, C)
        label = seg_label.reshape(P)
        valid = label != ignore_index
        num_valid = jnp.sum(valid)
        safe = jnp.where(valid, label, 0).astype(jnp.int32)

        if self.thresh is not None:
            probs = jax.nn.softmax(logit, axis=-1)
            gt_prob = jnp.take_along_axis(probs, safe[:, None],
                                          axis=-1)[:, 0]
            # invalid pixels → prob +inf so they sort after every valid one
            sort_prob = jnp.sort(jnp.where(valid, gt_prob, jnp.inf))
            # mmseg: min_threshold = sorted_valid[min(batch_kept, nv-1)],
            # or 0.0 when no valid pixel exists
            idx = jnp.clip(jnp.minimum(k, num_valid - 1), 0, P - 1)
            min_threshold = jnp.where(num_valid > 0, sort_prob[idx], 0.0)
            threshold = jnp.maximum(min_threshold, self.thresh)
            weight = (gt_prob < threshold) & valid
        else:
            logp = jax.nn.log_softmax(logit, axis=-1)
            loss = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
            loss = jnp.where(valid, loss, -jnp.inf)
            kth = jnp.sort(loss)[P - k]
            # when fewer than k valid pixels exist kth is -inf → keep all
            weight = (loss >= kth) & valid
        return weight.astype(jnp.float32).reshape(N, H, W)
