"""Mixture-of-Experts FFN with top-1 (Switch) routing.

Beyond-reference capability enabling *expert parallelism* — the fifth
axis of the parallelism matrix (dp / spatial / tp / pp / ep).  The
design follows the public Switch-Transformer recipe (Fedus et al.,
2021) expressed the TPU way:

* expert weights are STACKED on a leading E axis (``w1 (E, C, H)``,
  ``w2 (E, H, C)``) so expert parallelism is one sharding annotation —
  ``P('expert', None, None)`` — and GSPMD derives the all-to-all-style
  communication from the dispatch/combine einsums;
* routing is top-1 with a capacity factor: each token goes to its
  argmax expert if a slot is free (slot index = prefix count of that
  expert within the sequence), else it is DROPPED — the residual path
  carries it unchanged, exactly the Switch behavior;
* dispatch/combine are one-hot einsums (``(N,L,E,P)`` against
  ``(N,L,C)``) — dense MXU work with static shapes, no scatter;
* the Switch load-balancing auxiliary loss (E · Σ_e fraction_e ·
  mean-prob_e) is sown into the ``'moe_losses'`` collection, which the
  train step folds into the total loss.

The router computes in f32 regardless of the bf16 policy (tiny, and
argmax/softmax stability matters more than its FLOPs).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_, trunc_normal_
from ..basic.convolution import Linear
from ..basic.param_utils import create_param

_W_INIT = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)


class MoEFFN(nn.Module):
    """Drop-in MoE replacement for a transformer's fc1/GELU/fc2 MLP.

    Input/output: (N, L, C) token sequences.
    """

    embed_dims: int
    hidden: int
    num_experts: int
    capacity_factor: float = 1.25
    aux_loss_weight: float = 0.01
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.num_experts >= 2, "MoEFFN needs num_experts >= 2"
        N, L, C = x.shape
        E, H = self.num_experts, self.hidden
        cap = max(1, min(L, int(math.ceil(L * self.capacity_factor / E))))

        logits = Linear(C, E, trainable=self.trainable, weight_init=_W_INIT,
                        bias_init=_ZEROS, name="router")(x)
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1)  # (N, L, E)
        expert = jnp.argmax(probs, axis=-1)                      # (N, L)
        gate = jnp.max(probs, axis=-1)                           # (N, L)

        onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)    # (N, L, E)
        # slot of each token within its expert (prefix count), 0-based
        pos = jnp.cumsum(onehot, axis=1) * onehot                # 1-based
        keep = onehot * (pos <= cap)
        slot_oh = jax.nn.one_hot((pos - 1.0).astype(jnp.int32), cap,
                                 dtype=jnp.float32)              # (N,L,E,P)
        dispatch = slot_oh * keep[..., None]                     # 0/1

        w1 = create_param(self, "w1", _W_INIT, (E, C, H), self.trainable)
        b1 = create_param(self, "b1", _ZEROS, (E, H), self.trainable)
        w2 = create_param(self, "w2", _W_INIT, (E, H, C), self.trainable)
        b2 = create_param(self, "b2", _ZEROS, (E, C), self.trainable)

        xe = jnp.einsum("nlep,nlc->nepc", dispatch.astype(x.dtype), x)
        h = jnp.einsum("nepc,ech->neph", xe, w1.astype(x.dtype))
        h = nn.gelu(h + b1.astype(x.dtype)[None, :, None], approximate=False)
        y = jnp.einsum("neph,ehc->nepc", h, w2.astype(x.dtype))
        y = y + b2.astype(x.dtype)[None, :, None]
        # combine scales each kept token's expert output by its gate;
        # dropped tokens get zeros (the block residual carries them)
        combine = dispatch * gate[:, :, None, None]
        out = jnp.einsum("nlep,nepc->nlc", combine.astype(y.dtype), y)

        if train and self.aux_loss_weight:
            # Switch aux loss: E * sum_e(load_e * importance_e)
            load = jnp.mean(onehot, axis=(0, 1))                 # (E,)
            importance = jnp.mean(probs, axis=(0, 1))            # (E,)
            aux = jnp.float32(E) * jnp.sum(load * importance)
            self.sow("moe_losses", "load_balance",
                     jnp.float32(self.aux_loss_weight) * aux)
        return out
