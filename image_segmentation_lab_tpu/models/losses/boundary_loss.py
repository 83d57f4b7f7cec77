"""Class-balanced boundary BCE (mmseg ``BoundaryLoss``, the loss PIDNet
trains its D branch with).

Beyond-reference addition.  The boundary map is a rare-positive binary
problem, so the BCE is weighted by the *opposite* class frequency:
positive pixels get ``n_neg / n`` and negative pixels ``n_pos / n``
(pixels that are neither 0 nor 1 — e.g. derived from ignore regions —
get weight 0), then a plain mean over ALL elements, exactly upstream's
``F.binary_cross_entropy_with_logits(log_p, target, weight,
reduction='mean')``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.registry_hub import LOSS


@LOSS.register()
class BoundaryLoss:
    def __init__(self, loss_weight: float = 1.0,
                 loss_name: str = "loss_boundary"):
        self.loss_weight = loss_weight
        self._loss_name = loss_name

    def __call__(self, bd_pre, bd_gt, **kwargs):
        """bd_pre (N,H,W,1) boundary logits; bd_gt (N,H,W) in {0,1}."""
        x = bd_pre.reshape(-1).astype(jnp.float32)
        t = bd_gt.reshape(-1).astype(jnp.float32)
        pos = (t == 1).astype(jnp.float32)
        neg = (t == 0).astype(jnp.float32)
        n = jnp.maximum(pos.sum() + neg.sum(), 1.0)
        w = pos * neg.sum() / n + neg * pos.sum() / n
        bce = -(t * jax.nn.log_sigmoid(x) + (1 - t) * jax.nn.log_sigmoid(-x))
        return self.loss_weight * jnp.mean(w * bce)

    @property
    def loss_name(self):
        return self._loss_name
