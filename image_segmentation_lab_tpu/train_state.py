"""Train state + compiled train/eval steps.

The TPU-native replacement for the reference's epoch loop internals
(``utils/train_utils.py:31-103``): one ``TrainState`` pytree (params,
frozen params, BN statistics, optax state, step counter) and a single jitted
``train_step`` = forward → loss-sum → grad → optax update → BN-stat update,
with donated buffers.  The reference's GradScaler/autocast pair
(train.py:117, train_utils.py:85-91) is replaced by the bf16 dtype policy
(see ``core/mixed_precision``): layers compute in bf16, params/optimizer
state stay fp32, no loss scaling needed.

``parse_losses`` keeps the reference contract (train_utils.py:31-74): total
loss = sum of entries whose key contains 'loss'; every entry is mean-reduced
into the log dict.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .utils.jit_init import jit_init_off_cpu


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    frozen_params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self) -> Dict[str, Any]:
        out = {"params": self.params}
        if self.frozen_params:
            out["frozen_params"] = self.frozen_params
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out


def parse_losses(losses: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
    """Sum 'loss'-keyed entries; mean-log everything
    (reference train_utils.py:31-74).  Under pjit the means are already
    global, so the reference's distributed allreduce branch is implicit."""
    log_vars = {}
    for name, value in losses.items():
        log_vars[name] = jnp.mean(jnp.asarray(value))
    loss = sum(v for k, v in log_vars.items() if "loss" in k)
    log_vars["loss"] = loss
    return loss, log_vars


def create_train_state(model, rng, sample_img, sample_gt,
                       tx: optax.GradientTransformation) -> TrainState:
    """Initialize variables + optimizer state.

    Off-CPU the flax init runs under jit (see ``utils.jit_init``)."""
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}

    def _init(r, i, g):
        return model.init(r, i, g, img_metas={}, rescale=False,
                          return_loss=True, train=True)

    variables = jit_init_off_cpu(_init)(rngs, sample_img, sample_gt)
    params = variables.get("params", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        frozen_params=variables.get("frozen_params", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params))


def build_train_step_fn(model, tx: optax.GradientTransformation,
                        pipeline=None):
    """The un-jitted train-step body, shared by the single-device
    (``make_train_step``) and mesh-sharded (``parallel.mesh``) builders so
    the two can never drift.

    With ``pipeline`` given, the on-device augmentation fuses INTO the step:
    one XLA program runs aug → forward → grads → update, and the host ships
    raw **uint8** batches (4× less transfer than pre-cast float32).
    """

    def train_step(state: TrainState, img, gt, dropout_rng):
        if pipeline is not None:
            aug_rng, dropout_rng = jax.random.split(dropout_rng)
            img, gt = pipeline.batched_apply(aug_rng, img, gt)

        def loss_fn(params):
            variables = {"params": params,
                         "frozen_params": state.frozen_params,
                         "batch_stats": state.batch_stats}
            (seg_logits, losses), mutated = model.apply(
                variables, img, gt, img_metas={}, rescale=False,
                return_loss=True, train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats", "moe_losses"])
            # MoE blocks sow their Switch load-balancing aux losses into
            # 'moe_losses' (models/utils/moe.py); fold them into the total
            moe = mutated.get("moe_losses")
            if moe:
                losses = dict(losses, loss_moe_aux=sum(
                    jnp.sum(l) for l in jax.tree_util.tree_leaves(moe)))
            loss, log_vars = parse_losses(losses)
            return loss, (mutated, log_vars)

        grads, (mutated, log_vars) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=mutated.get("batch_stats", state.batch_stats))
        return new_state, log_vars

    return train_step


def make_train_step(model, tx: optax.GradientTransformation,
                    donate: bool = True, pipeline=None):
    """Build the jitted train step.

    batch = (img (N,H,W,C) float — or uint8 when ``pipeline`` is fused in,
    gt (N,H,W) int).  Returns (new_state, log_vars).  The whole step —
    augmentation, BN stat updates and the optimizer included — is one XLA
    program; buffers are donated so params update in place in HBM.
    """
    return jax.jit(build_train_step_fn(model, tx, pipeline),
                   donate_argnums=(0,) if donate else ())


def head_threshold(model) -> float:
    """Binary-segmentation threshold from the (last) decode-head cfg."""
    from collections.abc import Mapping

    from .models.decode_heads.decode_head import DEFAULT_BINARY_THRESHOLD
    dh = getattr(model, "decode_head", None)
    if isinstance(dh, (list, tuple)) and dh:
        dh = dh[-1]
    if isinstance(dh, Mapping):
        t = dh.get("threshold")
        return DEFAULT_BINARY_THRESHOLD if t is None else float(t)
    return DEFAULT_BINARY_THRESHOLD


def binarize_channels(value, threshold: float, is_probs: bool = False):
    """Make single-channel (binary) outputs argmax-able by the evaluator.

    For ``out_channels == 1`` the evaluator's channel argmax would always
    yield class 0 (the reference has the same latent defect,
    metrics.py:103-105).  Stacking a constant threshold channel in front —
    ``[logit(t), x]`` for logits, ``[t, p]`` for probabilities — makes
    ``argmax == (sigmoid(x) > t)`` exactly, preserving the head's
    ``threshold`` contract (decode_head.py:102-124) with no evaluator
    changes."""
    import math

    def fix(x):
        if not hasattr(x, "ndim") or x.shape[-1] != 1:
            return x
        const = threshold if is_probs else math.log(
            threshold / max(1.0 - threshold, 1e-8))
        return jnp.concatenate(
            [jnp.full_like(x, const), x], axis=-1)

    if isinstance(value, dict):
        return {k: binarize_channels(v, threshold, is_probs)
                for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return type(value)(fix(v) for v in value)
    return fix(value)


def make_tta_step(model, scales=(0.75, 1.0, 1.25)):
    """Jitted multi-scale + horizontal-flip TTA: averaged probabilities at
    the input resolution (the compiled analog of reference
    ``aug_test_logits``, encoder_decoder.py:337-353, with flip-back)."""
    from .utils.ops import resize

    @jax.jit
    def tta_step(variables, img):
        H, W = img.shape[1:3]
        acc = 0.0
        n = 0
        for s in scales:
            scaled = resize(img, size=(int(H * s), int(W * s)),
                            mode="bilinear", align_corners=False)
            for flip in (False, True):
                x = scaled[:, :, ::-1, :] if flip else scaled
                probs = model.apply(variables, x, method="inference")
                if flip:
                    probs = probs[:, :, ::-1, :]
                acc = acc + resize(probs, size=(H, W), mode="bilinear",
                                   align_corners=False)
                n += 1
        return acc / n

    return tta_step


def make_eval_step(model, rescale_size: Optional[Tuple[int, int]] = None,
                   mesh=None, batch_axes: Tuple[str, ...] = ("data",),
                   state_shardings=None):
    """Jitted validation step: losses + per-head evaluator-ready scores.

    Mirrors ``validate_one_epoch``'s per-batch model call
    (reference train_utils.py:106-137) — forward with loss, per-head logits
    (single-channel binary heads are expanded via ``binarize_channels`` so
    the evaluator's argmax honors the threshold), optionally rescaled to a
    static uniform ``ori_img_size_hw``.

    With ``mesh`` the step is data-parallel: batch split over the 'data'
    axis, state replicated, per-head logits returned batch-sharded and the
    loss means psum'd (replicated) — otherwise a multi-device run would
    redundantly evaluate the full batch on every chip.  The batch size
    must divide the mesh; callers keep a plain step for ragged tails.

    ``batch_axes=('data', 'space')`` additionally shards image height over
    the second mesh axis (the 2-D-mesh analog — per-chip eval activations
    then scale down exactly like the spatial train step's).

    ``state_shardings`` (a TrainState-shaped sharding pytree) pins the
    state inputs for the model-parallel CLI modes — TP keeps the
    projections sharded over 'model' and FSDP/ZeRO keep their shards
    resident instead of re-replicating the state every validation pass.
    """
    thr = head_threshold(model)

    def eval_step(state: TrainState, img, gt):
        variables = state.variables()
        meta = {"ori_img_size_hw": rescale_size} if rescale_size else {}
        (seg_logits, losses), _ = model.apply(
            variables, img, gt, img_metas=meta,
            rescale=rescale_size is not None, return_loss=True, train=False,
            mutable=[])
        _, log_vars = parse_losses(losses)
        seg_logits = {k: binarize_channels(v, thr)
                      for k, v in seg_logits.items()}
        return seg_logits, log_vars

    if mesh is None:
        return jax.jit(eval_step)
    from jax.sharding import NamedSharding, PartitionSpec
    from .parallel.mesh import replicated
    rep = replicated(mesh)
    data = NamedSharding(mesh, PartitionSpec(*batch_axes))
    state_sh = state_shardings if state_shardings is not None else rep
    return jax.jit(eval_step, in_shardings=(state_sh, data, data),
                   out_shardings=(data, rep))
