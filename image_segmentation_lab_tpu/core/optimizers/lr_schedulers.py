"""LR scheduler registry.

Parity target: reference ``core/optimizers/lr_update.py`` registers
StepLR/PolynomialLR/ExponentialLR/LambdaLR (:20-37) plus an unregistered
``WarmScheduler`` warmup (:40-79; registered here).

The reference steps schedulers once per epoch
(train.py:123 ``lr_scheduler.step()``).  JAX/optax redesign: a scheduler is a
*pure function of the global step*; each registered class stores the epoch
rule and ``schedule(base_lr, steps_per_epoch)`` lowers it to an optax
schedule with ``epoch = step // steps_per_epoch`` — identical lr trajectory,
but compiled into the update step (no host-side mutation).  ``optimizer`` is
accepted for reference call-shape compatibility and ignored.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax.numpy as jnp

from ..registry_hub import LR_SCHEDULER


class EpochSchedule:
    """Base: subclasses define ``lr_at_epoch(epoch, base_lr) -> float``."""

    def __init__(self, optimizer: Any = None):
        self.optimizer = optimizer  # unused; reference API parity
        self.last_epoch = 0

    def lr_at_epoch(self, epoch, base_lr):
        raise NotImplementedError

    # torch-like epoch API (for logging parity)
    def step(self):
        self.last_epoch += 1

    def get_last_lr(self, base_lr: float):
        return self.lr_at_epoch(self.last_epoch, base_lr)

    def schedule(self, base_lr: float,
                 steps_per_epoch: int) -> Callable:
        """Lower to an optax schedule fn(step) -> lr (traced-friendly)."""

        def fn(step):
            epoch = jnp.asarray(step) // max(steps_per_epoch, 1)
            return self.lr_at_epoch(epoch, base_lr)

        return fn


@LR_SCHEDULER.register("StepLR")
class StepLR(EpochSchedule):
    def __init__(self, step_size: int, gamma: float = 0.1, optimizer=None,
                 **kwargs):
        super().__init__(optimizer)
        self.step_size = step_size
        self.gamma = gamma

    def lr_at_epoch(self, epoch, base_lr):
        return base_lr * self.gamma ** (epoch // self.step_size)


@LR_SCHEDULER.register("PolynomialLR")
class PolynomialLR(EpochSchedule):
    def __init__(self, total_iters: int = 5, power: float = 1.0,
                 optimizer=None, **kwargs):
        super().__init__(optimizer)
        self.total_iters = total_iters
        self.power = power

    def lr_at_epoch(self, epoch, base_lr):
        frac = jnp.minimum(epoch, self.total_iters) / self.total_iters
        return base_lr * (1.0 - frac) ** self.power


@LR_SCHEDULER.register("ExponentialLR")
class ExponentialLR(EpochSchedule):
    def __init__(self, gamma: float, optimizer=None, **kwargs):
        super().__init__(optimizer)
        self.gamma = gamma

    def lr_at_epoch(self, epoch, base_lr):
        return base_lr * self.gamma ** epoch


@LR_SCHEDULER.register("LambdaLR")
class LambdaLR(EpochSchedule):
    def __init__(self, lr_lambda: Callable, optimizer=None, **kwargs):
        super().__init__(optimizer)
        self.lr_lambda = lr_lambda

    def lr_at_epoch(self, epoch, base_lr):
        return base_lr * self.lr_lambda(epoch)


@LR_SCHEDULER.register("WarmScheduler")
class WarmScheduler(EpochSchedule):
    """Linear/exponential warmup (reference lr_update.py:40-79), plus an
    ``after`` extension that chains into another scheduler post-warmup
    (the reference holds flat base lr).

    Reference argument names are accepted verbatim: ``warmup_iters``
    (the reference steps its scheduler once per epoch, so these are the
    same unit as ``warmup_epochs``), ``mode='exponential'``,
    ``start_ratio``/``start_lr``/``end_lr``.  Trajectory matches the
    reference get_lr exactly: at step 0 the lr IS the start lr; linear →
    ``(end-start)·t/w + start``; exponential → ``start·(end/start)^(t/w)``;
    once ``t ≥ w`` the lr reverts to the optimizer's base lr exactly like
    the reference (get_lr returns base_lrs, lr_update.py:74-79) — or to
    ``after``'s schedule when one is chained.
    """

    def __init__(self, warmup_epochs: Optional[int] = None,
                 warmup_iters: Optional[int] = None, mode: str = "linear",
                 warmup_ratio: Optional[float] = None,
                 start_ratio: Optional[float] = None,
                 start_lr: Optional[float] = None,
                 end_lr: Optional[float] = None,
                 after: Optional[dict] = None, optimizer=None, **kwargs):
        super().__init__(optimizer)
        assert mode in ("linear", "exp", "exponential"), (
            f"Unsupported warmup mode: {mode}")
        self.mode = "exp" if mode == "exponential" else mode
        w = warmup_iters if warmup_iters is not None else warmup_epochs
        self.warmup_epochs = int(w) if w is not None else 1
        r = start_ratio if start_ratio is not None else warmup_ratio
        self.warmup_ratio = 0.1 if r is None else float(r)
        self.start_lr = start_lr
        self.end_lr = end_lr
        if after is not None:
            from ..builder import build_from_cfg
            self.after = build_from_cfg(after, LR_SCHEDULER)
        else:
            self.after = None

    def lr_at_epoch(self, epoch, base_lr):
        if self.after is not None:
            main = self.after.lr_at_epoch(
                jnp.maximum(epoch - self.warmup_epochs, 0), base_lr)
        else:
            # Reference get_lr (lr_update.py:74-79) returns base_lrs once
            # warmup finishes, even when end_lr != base lr.
            main = base_lr
        start = (self.start_lr if self.start_lr is not None
                 else base_lr * self.warmup_ratio)
        end = self.end_lr if self.end_lr is not None else base_lr
        frac = jnp.clip(epoch / self.warmup_epochs, 0.0, 1.0)
        if self.mode == "linear":
            warm = (end - start) * frac + start
        else:
            warm = start * (end / max(start, 1e-12)) ** frac
        return jnp.where(epoch < self.warmup_epochs, warm, main)
