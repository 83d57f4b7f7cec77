"""Exponential moving average of model parameters (beyond-reference
training utility; the mmseg-ecosystem EMAHook analog).

``ema = decay * ema + (1 - decay) * params`` after every optimizer
step, maintained as one jitted tree_map — the update dispatches
asynchronously with the step, so the wall-clock cost is noise.
Validation and best-checkpoint selection then run on the smoothed
weights (the standard EMA deployment recipe), while ``last.pth`` keeps
the raw weights so resume semantics are unchanged.  The EMA tree is
checkpointed alongside the optimizer state (``train_state['ema_params']``
in ``last.pth``) and re-seeded on resume via ``ema_init``, so the
average continues across restarts instead of re-converging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def _lerp(ema, params, decay):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema, params)


def wrap_train_step_with_ema(train_step, init_params, decay: float,
                             ema_init=None):
    """Wrap a ``(state, img, gt, rng) -> (state, log_vars)`` step so an
    EMA of ``state.params`` is maintained alongside.

    ``ema_init`` (a params-shaped tree, e.g. the checkpointed
    ``train_state['ema_params']``) seeds the average; by default it
    starts from ``init_params``.

    Returns ``(wrapped_step, ema_params_fn)`` — call ``ema_params_fn()``
    for the current smoothed tree (device arrays, same sharding as the
    live params).
    """
    assert 0.0 < decay < 1.0, decay
    # the train step DONATES its state buffers — the EMA must own fresh
    # arrays, never references into the live (soon-deleted) params
    seed = init_params if ema_init is None else ema_init
    box = {"ema": jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: jnp.copy(jnp.asarray(x)), t))(seed)}

    def wrapped(state, img, gt, rng):
        state, log_vars = train_step(state, img, gt, rng)
        box["ema"] = _lerp(box["ema"], state.params, decay)
        return state, log_vars

    return wrapped, lambda: box["ema"]
