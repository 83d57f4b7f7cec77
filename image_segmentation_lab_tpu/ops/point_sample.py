"""Point sampling for PointRend (Kirillov et al., CVPR 2020).

TPU-native analog of mmcv's ``point_sample`` (which rides
``F.grid_sample``): evaluate an NHWC feature map at arbitrary
normalized (x, y) points.  The torch op is a general warp; here the
only consumer samples P points per image, so the lowering is a single
batched 4-corner gather + bilinear FMA over (N, P) indices — exactly the
index-count-bound gather regime this chip's cost model prefers
(docs/PERF.md) — with no HWxHW grid materialized.

Semantics pinned to ``grid_sample(input, 2*points - 1,
padding_mode='zeros')`` (the mmcv call): ``align_corners=False``
unnormalizes as ``p * size - 0.5``, corners outside the map contribute
zero via weight masking; ``mode='nearest'`` uses floor(px + 0.5) —
torch's nearest rule (golden-pinned in ``tests/test_pointrend.py``).

``calculate_uncertainty`` is mmseg's: minus the top-1/top-2 logit gap
(for a 1-channel binary head: minus |logit|, the distance to the 0.5
decision boundary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(p, size: int, align_corners: bool):
    if align_corners:
        return p * (size - 1)
    return p * size - 0.5


def point_sample(feat: jnp.ndarray, points: jnp.ndarray,
                 align_corners: bool = False,
                 mode: str = "bilinear") -> jnp.ndarray:
    """Sample ``feat`` (N, H, W, C) at ``points`` (N, P, 2) in [0, 1]
    ((x, y) order, grid_sample convention) -> (N, P, C)."""
    N, H, W, C = feat.shape
    flat = feat.reshape(N, H * W, C)
    px = _unnormalize(points[..., 0].astype(jnp.float32), W, align_corners)
    py = _unnormalize(points[..., 1].astype(jnp.float32), H, align_corners)

    if mode == "nearest":
        ix = jnp.floor(px + 0.5).astype(jnp.int32)
        iy = jnp.floor(py + 0.5).astype(jnp.int32)
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(valid[..., None], out, 0)

    assert mode == "bilinear", mode
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0
    fy = py - y0

    out = 0.0
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            ix, iy = x0 + dx, y0 + dy
            # zeros padding: out-of-map corners contribute nothing
            w = wx * wy * ((ix >= 0) & (ix < W)
                           & (iy >= 0) & (iy < H)).astype(jnp.float32)
            idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
            tap = jnp.take_along_axis(flat, idx[..., None], axis=1)
            out = out + tap.astype(jnp.float32) * w[..., None]
    return out.astype(feat.dtype)


def calculate_uncertainty(seg_logits: jnp.ndarray) -> jnp.ndarray:
    """Pointwise uncertainty of (..., C) logits: minus the top-1/top-2
    gap (mmseg point_head.calculate_uncertainty); for C == 1 (binary
    sigmoid head) minus the distance to the decision boundary."""
    if seg_logits.shape[-1] == 1:
        return -jnp.abs(seg_logits[..., 0])
    top2, _ = jax.lax.top_k(seg_logits, 2)
    return top2[..., 1] - top2[..., 0]
