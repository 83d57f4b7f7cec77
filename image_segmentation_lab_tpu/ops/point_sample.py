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

    # ONE gather for all four bilinear taps: this chip's gather cost
    # scales with INDEX COUNT, not slice bytes (docs/PERF.md cost
    # model), so the 2x2 corner patch should ride a single index row.
    # The fast FORM matters as much as the count (all measured in a
    # 20-deep fori_loop at the Mask2Former loss-path shapes, 16 maps x
    # 37632 points): 4 per-corner take_along_axis = 28.7 ms; a
    # lax.gather of (2,2,C) spatial slices = 1257 ms (and a vmapped
    # variant faulted the TPU worker outright) — spatial slice dims hit
    # a catastrophic lowering.  Instead, concatenate the four
    # statically-shifted corner copies on the CHANNEL axis (the
    # GlassBlur shifted-copies trick) so every patch is one
    # lane-contiguous row of a (N, (H+1)(W+1), 4C) array, then one
    # take_along_axis: 5.6 ms — 5.1x over the 4-tap form.  Out-of-map
    # corners keep exact grid_sample 'zeros' semantics via the weight
    # mask (a clamped index only happens when that corner's weight is
    # already zero; the 1-px zero pad supplies in-range neighbors).
    padded = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [padded[:, :-1, :-1], padded[:, :-1, 1:],
         padded[:, 1:, :-1], padded[:, 1:, 1:]], axis=-1)
    qflat = quad.reshape(N, (H + 1) * (W + 1), 4 * C)
    idx = (jnp.clip(y0 + 1, 0, H) * (W + 1) + jnp.clip(x0 + 1, 0, W))
    taps = jnp.take_along_axis(qflat, idx[..., None], axis=1)
    taps = taps.reshape(*idx.shape, 4, C)
    out = 0.0
    for t, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        wy = fy if dy else 1.0 - fy
        wx = fx if dx else 1.0 - fx
        ix, iy = x0 + dx, y0 + dy
        # zeros padding: out-of-map corners contribute nothing
        w = wx * wy * ((ix >= 0) & (ix < W)
                       & (iy >= 0) & (iy < H)).astype(jnp.float32)
        out = out + taps[..., t, :].astype(jnp.float32) * w[..., None]
    return out.astype(feat.dtype)


def calculate_uncertainty(seg_logits: jnp.ndarray) -> jnp.ndarray:
    """Pointwise uncertainty of (..., C) logits: minus the top-1/top-2
    gap (mmseg point_head.calculate_uncertainty); for C == 1 (binary
    sigmoid head) minus the distance to the decision boundary."""
    if seg_logits.shape[-1] == 1:
        return -jnp.abs(seg_logits[..., 0])
    top2, _ = jax.lax.top_k(seg_logits, 2)
    return top2[..., 1] - top2[..., 0]
