"""OHEM cross-entropy (mmseg ``OhemCrossEntropy`` semantics, the loss
PIDNet trains its semantic branches with).

Beyond-reference addition.  Unlike the OHEM *pixel sampler* already in
the zoo (``core/sampler``, reference decode_head.py:136-139 hook), this
is the PIDNet-style standalone loss: keep a pixel if the softmax
probability of its ground-truth class is below ``max(thres, p_k)``
where ``p_k`` is the ``min_kept``-th smallest gt-probability — i.e.
always mine at least ``min_kept`` hard pixels, more when many fall
under ``thres`` — and average the CE over the kept set only.

TPU-native formulation (static shapes end-to-end): invalid pixels get
gt-probability +inf so one global ``jnp.sort`` yields the valid-only
order, the threshold is one dynamic gather at index
``min(min_kept, n_valid - 1)``, and the kept set is a weight mask
folded into a masked mean — never a dynamic-shape selection.  Matches
upstream bit-for-bit in both regimes, including the quirk that with
fewer than ``min_kept`` valid pixels the threshold becomes the max
valid probability and the easiest pixel(s) drop out
(``tests/test_pidnet.py`` pins a torch twin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.registry_hub import LOSS
from .utils import get_class_weight


@LOSS.register()
class OhemCrossEntropy:
    def __init__(self,
                 ignore_label: int = 255,
                 thres: float = 0.7,
                 min_kept: int = 100000,
                 loss_weight: float = 1.0,
                 class_weight=None,
                 loss_name: str = "loss_ohem"):
        self.ignore_label = ignore_label
        self.thres = float(thres)
        self.min_kept = max(int(min_kept), 1)
        self.loss_weight = loss_weight
        self.class_weight = get_class_weight(class_weight)
        self._loss_name = loss_name

    def __call__(self, score, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=None, **kwargs):
        """score (N,H,W,C) logits; target (N,H,W) int.  ``weight`` (an
        optional per-pixel sampler weight) multiplies the kept-pixel CE,
        matching how the base head folds sampler weights into its other
        losses."""
        ignore = self.ignore_label if ignore_index is None else ignore_index
        x = score.astype(jnp.float32)
        C = x.shape[-1]
        flat = x.reshape(-1, C)
        labels = target.reshape(-1).astype(jnp.int32)
        valid = labels != ignore
        safe = jnp.where(valid, labels, 0)

        logp = jax.nn.log_softmax(flat, axis=-1)
        losses = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
        if self.class_weight is not None:
            cw = jnp.asarray(self.class_weight, jnp.float32)
            losses = losses * cw[safe]
        if weight is not None:
            losses = losses * weight.reshape(-1).astype(jnp.float32)

        # gt-class probability; invalid pixels sort to the end via +inf
        gt_prob = jnp.exp(jnp.take_along_axis(logp, safe[:, None],
                                              axis=-1)[:, 0])
        gt_prob = jnp.where(valid, gt_prob, jnp.inf)
        n_valid = jnp.sum(valid)
        k = jnp.clip(jnp.minimum(self.min_kept, n_valid - 1), 0,
                     gt_prob.shape[0] - 1)
        min_value = jnp.sort(gt_prob)[k]
        threshold = jnp.maximum(min_value, self.thres)

        kept = valid & (gt_prob < threshold)
        kept_f = kept.astype(jnp.float32)
        loss = jnp.sum(losses * kept_f) / jnp.maximum(jnp.sum(kept_f), 1.0)
        return self.loss_weight * loss

    @property
    def loss_name(self):
        return self._loss_name
