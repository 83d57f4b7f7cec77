"""Optimizer update-math parity vs torch.optim.

The reference registers torch.optim classes directly
(core/optimizers/torch_optimizers.py); our factories build optax chains
with torch argument names.  These tests drive both sides with identical
synthetic gradient sequences and compare the parameter trajectories —
the strongest guarantee that training dynamics match.
"""

import jax.numpy as jnp
import numpy as np
import optax
import torch

from image_segmentation_lab_tpu.core.builder import build_optimizer


def _trajectory_close(cfg, make_torch_opt, steps=5, atol=1e-6):
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(steps)]

    # optax side
    tx = build_optimizer(dict(cfg))
    params = jnp.asarray(p0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    # torch side
    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = make_torch_opt([tp])
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()

    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                               atol=atol, rtol=1e-5)


def test_sgd_momentum_weight_decay_matches_torch():
    _trajectory_close(
        dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=5e-4),
        lambda ps: torch.optim.SGD(ps, lr=0.05, momentum=0.9,
                                   weight_decay=5e-4))


def test_sgd_nesterov_matches_torch():
    _trajectory_close(
        dict(type="SGD", lr=0.05, momentum=0.9, nesterov=True),
        lambda ps: torch.optim.SGD(ps, lr=0.05, momentum=0.9,
                                   nesterov=True))


def test_adam_weight_decay_matches_torch():
    _trajectory_close(
        dict(type="Adam", lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
             weight_decay=1e-2),
        lambda ps: torch.optim.Adam(ps, lr=1e-3, betas=(0.9, 0.999),
                                    eps=1e-8, weight_decay=1e-2))


def test_adamw_matches_torch():
    _trajectory_close(
        dict(type="AdamW", lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
             weight_decay=0.05),
        lambda ps: torch.optim.AdamW(ps, lr=1e-3, betas=(0.9, 0.999),
                                     eps=1e-8, weight_decay=0.05))


def test_adamax_matches_torch():
    _trajectory_close(
        dict(type="Adamax", lr=2e-3, betas=(0.9, 0.999), eps=1e-8),
        lambda ps: torch.optim.Adamax(ps, lr=2e-3, betas=(0.9, 0.999),
                                      eps=1e-8))


def test_rmsprop_matches_torch_loosely():
    # optax folds eps inside the rsqrt (rsqrt(nu + eps)) where torch adds
    # it outside (sqrt(nu) + eps) — identical to ~1e-4 at eps=1e-8
    _trajectory_close(
        dict(type="RMSprop", lr=1e-3, alpha=0.99, eps=1e-8),
        lambda ps: torch.optim.RMSprop(ps, lr=1e-3, alpha=0.99, eps=1e-8),
        atol=1e-4)
