"""Epoch-level train/validate helpers.

Parity target: reference ``utils/train_utils.py``: ``train_one_epoch``
(:77-103, tqdm + running-mean log vars), ``validate_one_epoch`` (:106-137,
no-grad loss + evaluator.process per batch + compute_metrics),
``pth_metadata`` (:140-157) and ``save_model`` (:160-165).

The heavy lifting lives in the compiled steps (``train_state.py``); these
helpers own the host loop: data loading, on-device augmentation invocation,
logging, metadata assembly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from tqdm import tqdm
except Exception:  # pragma: no cover
    def tqdm(x, **kwargs):
        return x

from ..core.initialize.checkpoint import save_checkpoint


def train_one_epoch(epoch: int,
                    train_step,
                    state,
                    dataloader,
                    pipeline=None,
                    base_rng=None,
                    log: bool = True,
                    fused_aug: bool = False) -> tuple:
    """Run one epoch; returns (state, mean log_vars dict).

    Augmentation placement:

    * ``fused_aug=True`` — the train step was built with the pipeline fused
      in (``make_train_step(..., pipeline=...)``); raw uint8 batches go
      straight to the step (one XLA program, 4× smaller host→device copies).
    * else, with ``pipeline`` given, each batch is augmented by the
      pipeline's own jitted program before the step.
    """
    dataloader.set_epoch(epoch)
    base_rng = base_rng if base_rng is not None else jax.random.PRNGKey(epoch)
    running: Dict[str, Any] = {}
    count = 0
    bar = tqdm(dataloader, total=len(dataloader),
               desc=f"train epoch {epoch}", leave=False) if log \
        else dataloader
    for i, (images, labels, infos) in enumerate(bar):
        rng = jax.random.fold_in(base_rng, i)
        if fused_aug:
            images = jnp.asarray(images)  # raw uint8; aug runs in the step
            labels = jnp.asarray(labels).astype(jnp.int32)
            step_rng = rng  # the fused step derives its own aug rng split
        elif pipeline is not None:
            aug_rng, step_rng = jax.random.split(rng)
            images, labels = pipeline(aug_rng, images, labels)
            labels = labels.astype(jnp.int32)
        else:
            _, step_rng = jax.random.split(rng)
            images = jnp.asarray(images, jnp.float32)
            labels = jnp.asarray(labels).astype(jnp.int32)
        state, log_vars = train_step(state, images, labels, step_rng)
        count += 1
        # accumulate on device: a float() here would block until the step
        # finishes every iteration and kill the dispatch/host overlap
        for k, v in log_vars.items():
            running[k] = running.get(k, 0.0) + v
        if log and hasattr(bar, "set_postfix") and (
                i % 10 == 0 or count == len(dataloader)):
            bar.set_postfix({k: f"{float(v) / count:.4f}"
                             for k, v in list(running.items())[:3]})
    mean_vars = {k: float(v) / max(count, 1) for k, v in running.items()}
    return state, mean_vars


def validate_one_epoch(epoch: int,
                       eval_step,
                       state,
                       dataloader,
                       evaluator,
                       pipeline=None,
                       log: bool = True) -> tuple:
    """(reference train_utils.py:106-137): per-batch loss + evaluator
    processing, then compute_metrics.  Returns (val log_vars, metrics)."""
    running: Dict[str, float] = {}
    count = 0
    bar = tqdm(dataloader, total=len(dataloader),
               desc=f"val epoch {epoch}", leave=False) if log else dataloader
    for batch_idx, (images, labels, infos) in enumerate(bar):
        if pipeline is not None:
            rng = jax.random.PRNGKey(epoch * 100003 + batch_idx)
            images, labels = pipeline(rng, images, labels)
        else:
            images = jnp.asarray(images, jnp.float32)
            labels = jnp.asarray(labels)
        labels = labels.astype(jnp.int32)
        seg_logits, log_vars = eval_step(state, images, labels)
        count += 1
        for k, v in log_vars.items():
            running[k] = running.get(k, 0.0) + float(v)
        if "ori_gt" not in infos:
            infos = dict(infos)
            infos["ori_gt"] = np.asarray(jax.device_get(labels))
        evaluator.process(batch_idx, seg_logits, infos)
    metrics = evaluator.compute_metrics()
    mean_vars = {k: v / max(count, 1) for k, v in running.items()}
    return mean_vars, metrics


def pth_metadata(metadata: Dict[str, Any],
                 epoch: int,
                 fits: float,
                 train_log_vars: Optional[Dict] = None,
                 val_log_vars: Optional[Dict] = None,
                 val_metrics: Optional[Dict] = None) -> Dict[str, Any]:
    """Merge train./val./metric.* keys (reference train_utils.py:140-157)."""
    meta = dict(metadata)
    meta.update(epoch=epoch, fits=float(fits))
    for prefix, vars_ in (("train", train_log_vars), ("val", val_log_vars)):
        if vars_:
            for k, v in vars_.items():
                meta[f"{prefix}.{k}"] = float(v)
    if val_metrics:
        for head, metrics in val_metrics.items():
            for k, v in metrics.items():
                if np.isscalar(v) or (isinstance(v, np.ndarray)
                                      and v.ndim == 0):
                    meta[f"metric.{head}.{k}"] = float(v)
                else:
                    meta[f"metric.{head}.{k}"] = np.asarray(v).tolist()
    return meta


def save_model(state, metadata: Dict[str, Any], path,
               include_train_state: bool = False,
               backend: str = "pickle", ema_params=None) -> None:
    """``{'metadata', 'state_dict'}`` checkpoint (reference
    train_utils.py:160-165) with optional optimizer state for resume.
    ``ema_params`` (the smoothed tree when --ema-decay is on) rides the
    ``train_state`` blob so resume continues the average.
    ``backend='orbax_async'`` overlaps the write with the next epoch."""
    train_state = None
    if include_train_state:
        train_state = dict(step=np.asarray(jax.device_get(state.step)),
                           opt_state=jax.device_get(state.opt_state))
        if ema_params is not None:
            train_state["ema_params"] = jax.device_get(ema_params)
    save_checkpoint(state.variables(), path, metadata=metadata,
                    train_state=train_state, backend=backend)
