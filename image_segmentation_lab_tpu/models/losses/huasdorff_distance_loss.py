"""Hausdorff-distance loss (Karimi & Salcudean, TMI 2019: "Reducing the
Hausdorff Distance in Medical Image Segmentation with CNNs"; mmseg
``HuasdorffDisstanceLoss`` — upstream's spelling — semantics).

Beyond-reference addition completing mmseg's loss module.  Per
foreground class c the squared softmax error is weighted by how far a
mispredicted pixel sits from the relevant boundary:

    loss_c = mean_pixels( (p_c - y_c)² · (EDT²(gt_c) + EDT²(pred_c)) )

with EDT the Euclidean distance transform of the class's binary mask
(foreground pixels carry their distance to the nearest background
pixel, background pixels 0 — `scipy.ndimage.distance_transform_edt`
convention, which upstream calls on the host per step).  Distance maps
are constants of the step (upstream wraps them in ``no_grad``); the
gradient flows through the softmax error only.

TPU-native redesign: the EDT runs **on device** with static shapes
instead of a host round-trip — an exact two-stage separable transform:
(1) per-column nearest-background row distance via two `lax.scan`
passes, (2) the exact squared-Euclidean lower envelope
``D²[i,j] = min_k (d[i,k]² + (j-k)²)`` as a vectorized min over a
static (W, W) offset-cost table, row-blocked to bound memory.  Both
stages are VPU element-wise work; `vmap` batches over images.  Masks
with no background pixels yield 0 (upstream's scipy call is undefined
there; its ``posmask.any()`` guard only covers the no-foreground case).

Channels-last: pred (N, H, W, C) logits, target (N, H, W) int.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ...core.registry_hub import LOSS
from .utils import get_class_weight, weight_reduce_loss


def edt_sq(fg_mask: jnp.ndarray) -> jnp.ndarray:
    """Exact squared Euclidean distance transform of one (H, W) bool mask.

    Foreground (True) pixels → squared distance to the nearest
    background pixel; background pixels → 0.  If the mask has no
    background at all, returns zeros.
    """
    H, W = fg_mask.shape
    inf = jnp.float32(H + W + 1)
    # stage 1: per-column distance (in rows) to the nearest background
    f = jnp.where(fg_mask, inf, 0.0).astype(jnp.float32)

    def step(carry, row):
        d = jnp.minimum(row, carry + 1.0)
        return d, d

    _, down = lax.scan(step, jnp.full((W,), inf), f)
    _, up = lax.scan(step, jnp.full((W,), inf), f, reverse=True)
    d2 = jnp.minimum(jnp.minimum(down, up), inf) ** 2  # (H, W)

    # stage 2: exact lower envelope across columns
    j = jnp.arange(W, dtype=jnp.float32)
    cost = (j[:, None] - j[None, :]) ** 2  # (k, j) static offset table

    block = 8 if H % 8 == 0 else 1

    def envelope(rows):  # (block, W) → (block, W)
        return jnp.min(rows[:, :, None] + cost[None, :, :], axis=1)

    out = lax.map(envelope, d2.reshape(H // block, block, W))
    out = out.reshape(H, W)
    has_bg = jnp.any(~fg_mask)
    return jnp.where(has_bg, jnp.minimum(out, inf ** 2), 0.0)


@LOSS.register()
class HuasdorffDisstanceLoss:
    """mmseg's HD loss (registry name keeps upstream's spelling)."""

    def __init__(self, reduction: str = "mean", class_weight=None,
                 loss_weight: float = 1.0, ignore_index: int = 255,
                 loss_name: str = "loss_huasdorff_disstance"):
        assert reduction in ("none", "mean", "sum")
        self.reduction = reduction
        self.class_weight = get_class_weight(class_weight)
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self._loss_name = loss_name

    def __call__(self, pred, target, avg_factor=None,
                 reduction_override=None, **kwargs):
        assert reduction_override in (None, "none", "mean", "sum")
        reduction = reduction_override or self.reduction
        C = pred.shape[-1]
        assert C >= 2, "HD loss needs softmax channels (out_channels >= 2)"
        probs = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        valid = (target != self.ignore_index)
        tgt = jnp.where(valid, target, 0)
        seg_label = jnp.argmax(probs, axis=-1)

        batched_edt = jax.vmap(edt_sq)
        per_class = []
        for c in range(1, C):  # upstream skips the background class
            gt_dtm2 = lax.stop_gradient(batched_edt(tgt == c))
            seg_dtm2 = lax.stop_gradient(batched_edt(seg_label == c))
            y = (tgt == c).astype(jnp.float32)
            delta = (probs[..., c] - y) ** 2 * valid.astype(jnp.float32)
            loss_c = jnp.mean(delta * (gt_dtm2 + seg_dtm2),
                              axis=(1, 2))  # per sample
            if self.class_weight is not None:
                loss_c = loss_c * jnp.float32(self.class_weight[c])
            per_class.append(loss_c)
        loss = sum(per_class) / C  # (N,)
        loss = weight_reduce_loss(loss, None, reduction, avg_factor)
        return self.loss_weight * loss

    @property
    def loss_name(self):
        return self._loss_name
