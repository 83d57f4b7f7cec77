"""Pixel samplers (online hard example mining).

The reference declares a SAMPLER registry and a ``sampler`` hook on decode
heads (decode_head.py:136-139, :272-275) but ships **no implementation** —
``core/__init__.py`` even imports a nonexistent ``core.sampler`` module
(SURVEY.md §8.2).  This implements the standard OHEM pixel sampler (mmseg
semantics) so the hook is real:

* with ``thresh``: keep valid pixels whose predicted ground-truth-class
  probability is below ``min(thresh, prob of the min_kept-th hardest)``;
* without: keep the ``min_kept`` highest-loss pixels per image.

Everything is mask-based top-k (jit-safe, static shapes).
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
        """seg_logit (N,H,W,C), seg_label (N,H,W) → weight (N,H,W) float."""
        ignore_index = head.ignore_index
        N, H, W, C = seg_logit.shape
        P = H * W
        k = min(self.min_kept, P)
        logit = seg_logit.astype(jnp.float32).reshape(N, P, C)
        label = seg_label.reshape(N, P)
        valid = label != ignore_index
        safe = jnp.where(valid, label, 0).astype(jnp.int32)

        if self.thresh is not None:
            probs = jax.nn.softmax(logit, axis=-1)
            gt_prob = jnp.take_along_axis(probs, safe[..., None],
                                          axis=-1)[..., 0]
            # invalid pixels → prob 1 (never selected, sort last)
            gt_prob = jnp.where(valid, gt_prob, 1.0)
            sorted_prob = jnp.sort(gt_prob, axis=1)
            kth = sorted_prob[:, k - 1]
            threshold = jnp.maximum(kth, self.thresh)[:, None]
            weight = (gt_prob < threshold) & valid
        else:
            logp = jax.nn.log_softmax(logit, axis=-1)
            loss = -jnp.take_along_axis(logp, safe[..., None],
                                        axis=-1)[..., 0]
            loss = jnp.where(valid, loss, -jnp.inf)
            kth = jnp.sort(loss, axis=1)[:, P - k]
            weight = (loss >= kth[:, None]) & valid
        return weight.astype(jnp.float32).reshape(N, H, W)
