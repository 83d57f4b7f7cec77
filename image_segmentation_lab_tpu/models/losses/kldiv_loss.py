"""Temperature-scaled KL-divergence loss (mmseg ``KLDivLoss`` semantics).

Beyond-reference addition completing mmseg's loss module.  Measures
KL(softmax(target/T) || softmax(input/T)) channel-wise — the standard
distillation objective (Hinton et al., 2015): both maps are logits over
the channel axis, the target side is treated as the teacher (no gradient
is taken through it by the caller's choice; the loss itself is pure).

Semantics mirror ``torch.nn.functional.kl_div(log_softmax(input/T),
softmax(target/T), reduction='none') * T**2`` followed by an
*instance-wise* reduction: 'mean'/'sum' reduce over everything but the
batch axis, returning one value per sample; 'none' returns the
element-wise map.  Channels-last: input/target (N, ..., C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.registry_hub import LOSS


@LOSS.register()
class KLDivLoss:
    def __init__(self, temperature: float = 1.0, reduction: str = "mean",
                 loss_weight: float = 1.0, loss_name: str = "loss_kld"):
        assert isinstance(temperature, (int, float)), \
            "temperature must be a number"
        assert reduction in ("none", "mean", "sum"), \
            f"invalid reduction {reduction!r}"
        self.temperature = float(temperature)
        self.reduction = reduction
        self.loss_weight = loss_weight
        self._loss_name = loss_name

    def __call__(self, input, target, **kwargs):
        """input/target: logits of identical shape (N, ..., C)."""
        assert input.shape == target.shape, \
            "input and target must have the same shape"
        T = self.temperature
        logp = jax.nn.log_softmax(input.astype(jnp.float32) / T, axis=-1)
        q = jax.nn.softmax(target.astype(jnp.float32) / T, axis=-1)
        # pointwise KL terms q*(log q - log p); q→0 limit is 0
        loss = jnp.where(q > 0, q * (jnp.log(jnp.maximum(q, 1e-38)) - logp),
                         0.0) * (T * T)
        if self.reduction == "none":
            return self.loss_weight * loss
        n = loss.shape[0]
        flat = loss.reshape(n, -1)
        red = flat.mean(axis=1) if self.reduction == "mean" \
            else flat.sum(axis=1)
        return self.loss_weight * red

    @property
    def loss_name(self):
        return self._loss_name
