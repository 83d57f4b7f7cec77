"""Grad-CAM for segmentors.

The reference shells out to the ``pytorch_grad_cam`` package
(tools/analysis_tools/cam_visualization.py:33-57) with a
``SemanticSegmentationTarget`` objective = masked sum of one class's logits.
In JAX the whole tool is ~40 lines of ``jax.grad``: differentiate that
objective w.r.t. a chosen backbone stage's features, weight channels by the
spatially-pooled gradients, ReLU, upsample, normalize.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.ops import resize


class SemanticSegmentationTarget:
    """Masked class-score objective (reference cam_visualization.py:33-57)."""

    def __init__(self, category: int, mask: np.ndarray):
        self.category = category
        self.mask = jnp.asarray(mask, jnp.float32)

    def __call__(self, seg_logits):  # (H, W, C)
        return jnp.sum(seg_logits[..., self.category] * self.mask)


def grad_cam(inf_model,
             img: np.ndarray,
             target: SemanticSegmentationTarget,
             feature_index: int = -1) -> np.ndarray:
    """Compute a (H, W) CAM in [0, 1] for ``img`` (H,W,C float, already
    normalized by the eval pipeline)."""
    model, variables = inf_model.model, inf_model.variables
    x = jnp.asarray(img, jnp.float32)[None]
    feats = model.apply(variables, x, method="extract_feat")
    feats = list(feats) if isinstance(feats, (list, tuple)) else [feats]
    feature_index = feature_index % len(feats)

    align_corners = (inf_model.cfg or {}).get("decode_head", {}).get(
        "align_corners", False)

    def score(feat_k):
        patched = list(feats)
        patched[feature_index] = feat_k
        logits = model.apply(variables, tuple(patched),
                             method="decode_from_features")
        logits = resize(logits, size=x.shape[1:3], mode="bilinear",
                        align_corners=align_corners)
        return target(logits[0])

    feat = feats[feature_index]
    grads = jax.grad(score)(feat)  # (1, h, w, C)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)
    cam = jax.nn.relu(jnp.sum(weights * feat, axis=-1, keepdims=True))
    cam = resize(cam, size=x.shape[1:3], mode="bilinear",
                 align_corners=False)[0, ..., 0]
    cam = cam - cam.min()
    cam = cam / jnp.maximum(cam.max(), 1e-8)
    return np.asarray(jax.device_get(cam))


def show_cam_on_image(img: np.ndarray, cam: np.ndarray,
                      alpha: float = 0.5) -> np.ndarray:
    """Overlay a [0,1] CAM on a uint8 RGB image with a jet-like colormap."""
    c = np.clip(cam, 0, 1)
    heat = np.stack([
        np.clip(1.5 - np.abs(4 * c - 3), 0, 1),   # R
        np.clip(1.5 - np.abs(4 * c - 2), 0, 1),   # G
        np.clip(1.5 - np.abs(4 * c - 1), 0, 1),   # B
    ], axis=-1)
    out = (1 - alpha) * img.astype(np.float32) / 255.0 + alpha * heat
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)
