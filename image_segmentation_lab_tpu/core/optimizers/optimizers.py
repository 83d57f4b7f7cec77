"""Optimizer registry (optax-backed).

Parity target: reference ``core/optimizers/torch_optimizers.py`` which
registers SGD/Adam/SparseAdam/AdamW/Adadelta/ASGD/RMSprop/Rprop/RAdam/NAdam/
LBFGS/Adamax wrappers over torch.optim (and whose AdamW factory infinitely
recurses — SURVEY.md §8.8; fixed here by construction).

Each factory takes the torch argument names used by reference schedule
configs (``lr``, ``momentum``, ``weight_decay``, ``betas``, ``eps``...) and
returns an ``optax.GradientTransformation``.  ``lr`` may be a python float or
an optax schedule (the LR_SCHEDULER registry produces schedules, see
``lr_schedulers.py``).  Weight decay follows torch semantics (decoupled for
AdamW, L2-into-gradient for the others).
"""

from __future__ import annotations

from typing import Any

import optax

from ..registry_hub import OPTIMIZER


def _maybe_l2(tx: optax.GradientTransformation,
              weight_decay: float) -> optax.GradientTransformation:
    """torch-style L2 regularization: decay added to the *gradient* before
    the optimizer update."""
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@OPTIMIZER.register("SGD")
def sgd(lr: Any, momentum: float = 0.0, weight_decay: float = 0.0,
        dampening: float = 0.0, nesterov: bool = False):
    assert dampening == 0.0, "dampening is not supported"
    tx = optax.sgd(learning_rate=lr, momentum=momentum or None,
                   nesterov=nesterov)
    # torch applies L2 before the momentum accumulation → prepend
    return _maybe_l2(tx, weight_decay)


@OPTIMIZER.register("Adam")
def adam(lr: Any, betas=(0.9, 0.999), eps: float = 1e-8,
         weight_decay: float = 0.0, amsgrad: bool = False):
    assert not amsgrad, "amsgrad is not supported"
    tx = optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)
    return _maybe_l2(tx, weight_decay)


@OPTIMIZER.register("AdamW")
def adamw(lr: Any, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.01, amsgrad: bool = False):
    assert not amsgrad, "amsgrad is not supported"
    return optax.adamw(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


@OPTIMIZER.register("SparseAdam")
def sparse_adam(lr: Any, betas=(0.9, 0.999), eps: float = 1e-8):
    # gradients are dense in JAX — plain adam is the faithful equivalent
    return optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)


@OPTIMIZER.register("Adadelta")
def adadelta(lr: Any = 1.0, rho: float = 0.9, eps: float = 1e-6,
             weight_decay: float = 0.0):
    tx = optax.adadelta(learning_rate=lr, rho=rho, eps=eps)
    return _maybe_l2(tx, weight_decay)


@OPTIMIZER.register("ASGD")
def asgd(lr: Any = 1e-2, weight_decay: float = 0.0, **_ignored):
    # averaged SGD: optax has no direct analog; SGD is the practical stand-in
    return _maybe_l2(optax.sgd(learning_rate=lr), weight_decay)


@OPTIMIZER.register("RMSprop")
def rmsprop(lr: Any = 1e-2, alpha: float = 0.99, eps: float = 1e-8,
            weight_decay: float = 0.0, momentum: float = 0.0,
            centered: bool = False):
    tx = optax.rmsprop(learning_rate=lr, decay=alpha, eps=eps,
                       centered=centered, momentum=momentum or None)
    return _maybe_l2(tx, weight_decay)


@OPTIMIZER.register("Rprop")
def rprop(lr: Any = 1e-2, etas=(0.5, 1.2), step_sizes=(1e-6, 50.0)):
    return optax.rprop(learning_rate=lr, eta_minus=etas[0], eta_plus=etas[1],
                       min_step_size=step_sizes[0],
                       max_step_size=step_sizes[1])


@OPTIMIZER.register("RAdam")
def radam(lr: Any, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0):
    tx = optax.radam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)
    return _maybe_l2(tx, weight_decay)


@OPTIMIZER.register("NAdam")
def nadam(lr: Any = 2e-3, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0):
    tx = optax.nadam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)
    return _maybe_l2(tx, weight_decay)


@OPTIMIZER.register("Adamax")
def adamax(lr: Any = 2e-3, betas=(0.9, 0.999), eps: float = 1e-8,
           weight_decay: float = 0.0):
    tx = optax.adamax(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)
    return _maybe_l2(tx, weight_decay)


@OPTIMIZER.register("LBFGS")
def lbfgs(lr: Any = 1.0, **_ignored):
    return optax.lbfgs(learning_rate=lr)
