"""Scale-invariant logarithmic loss (Eigen et al., NeurIPS 2014; mmseg
``SiLogLoss`` semantics, the dense-regression loss its depth heads use).

Beyond-reference addition completing mmseg's loss module.  For positive
prediction/target pairs, with d = log(target) - log(pred) over valid
pixels (target > eps, d finite):

    loss_i = sqrt( mean(d²) - lambd · mean(d)² )        per sample i

then the usual weight/reduction pipeline.  Invalid pixels are masked out
of both moments.  Channels-last: pred/target (N, H, W) or (N, H, W, 1)
positive-valued maps.  All moments accumulate in f32 on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.registry_hub import LOSS
from .utils import weight_reduce_loss


def silog_loss(pred, target, lambd: float = 0.5, eps: float = 1e-4):
    """Per-sample scale-invariant log loss; pred/target (N, ...)."""
    n = pred.shape[0]
    p = pred.reshape(n, -1).astype(jnp.float32)
    t = target.reshape(n, -1).astype(jnp.float32)
    valid = (t > eps) & (p > eps)
    d = jnp.where(valid,
                  jnp.log(jnp.maximum(t, eps)) - jnp.log(jnp.maximum(p, eps)),
                  0.0)
    cnt = jnp.maximum(valid.sum(axis=1).astype(jnp.float32), 1.0)
    m2 = (d * d).sum(axis=1) / cnt
    m1 = d.sum(axis=1) / cnt
    return jnp.sqrt(jnp.maximum(m2 - lambd * m1 * m1, 0.0) + eps)


@LOSS.register()
class SiLogLoss:
    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0,
                 eps: float = 1e-4, lambd: float = 0.5,
                 loss_name: str = "loss_silog"):
        assert reduction in ("none", "mean", "sum")
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.eps = float(eps)
        self.lambd = float(lambd)
        self._loss_name = loss_name

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        assert pred.shape[0] == target.shape[0], \
            "pred and target must share the batch dimension"
        assert reduction_override in (None, "none", "mean", "sum")
        reduction = reduction_override or self.reduction
        loss = silog_loss(pred, target, lambd=self.lambd, eps=self.eps)
        if weight is not None:
            weight = jnp.asarray(weight, jnp.float32).reshape(loss.shape)
        loss = weight_reduce_loss(loss, weight, reduction, avg_factor)
        return self.loss_weight * loss

    @property
    def loss_name(self):
        return self._loss_name
