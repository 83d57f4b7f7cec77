"""Resize / upsample primitives.

Parity target: reference ``utils/ops.py:7-69`` — ``resize`` (the single
upsampling primitive used by every head and by whole/slide inference) and the
``Upsample`` module.  ``jax.image.resize`` implements only the
half-pixel-centers convention, so bilinear interpolation with **both**
``align_corners`` semantics of ``torch.nn.functional.interpolate`` is
implemented here explicitly (separable row/column gathers + fused
multiply-adds; XLA fuses the two passes).  Exact coordinate rules:

* ``align_corners=True``:  ``src = dst * (in-1)/(out-1)``
* ``align_corners=False``: ``src = clamp((dst+0.5) * in/out - 0.5, 0, in-1)``
* ``nearest``:             ``src = floor(dst * in/out)`` (torch legacy rule)

Verified bit-exactly against torch CPU in tests/test_ops.py; this is the
cornerstone of mIoU parity (SURVEY.md §7 "hard parts" (a)).
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _bilinear_1d_weights(in_size: int, out_size: int, align_corners: bool,
                         scale: Optional[float] = None):
    """Static gather indices + lerp weights for one spatial axis.

    ``scale``: when the caller was given a ``scale_factor`` (not a size),
    torch maps coordinates with ``src = (dst+0.5)/scale - 0.5`` using the
    *user's* scale, not the realized in/out size ratio — they differ when
    ``in_size*scale`` is fractional (e.g. 17 → 8 at scale 0.5 uses step 2.0,
    not 17/8).  align_corners=True ignores the scale, like torch.
    """
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        step = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = dst * step
    else:
        step = (1.0 / scale) if scale else in_size / out_size
        src = np.maximum((dst + 0.5) * step - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int32)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


def _interp_matrix(in_size: int, out_size: int, align_corners: bool,
                   scale: Optional[float] = None) -> jnp.ndarray:
    """Dense (out, in) interpolation matrix (≤2 nonzeros per row).

    Built ON DEVICE from the (small) per-row index/weight vectors rather
    than baked in as an (out×in) f32 literal: a 640→800 matrix is a 2 MB
    constant, and a multi-view TTA graph accumulates tens of them — enough
    to exceed the remote-compile request limit of a tunneled TPU backend
    (observed HTTP 413).  i0==i1 at the edges sums (1-w)+w = 1 exactly like
    the scatter-add construction this replaces."""
    i0, i1, w1 = _bilinear_1d_weights(in_size, out_size, align_corners,
                                      scale)
    i0 = jnp.asarray(i0)
    i1 = jnp.asarray(i1)
    w1 = jnp.asarray(w1)
    cols = jnp.arange(in_size, dtype=jnp.int32)
    return ((cols[None, :] == i0[:, None]) * (1.0 - w1)[:, None]
            + (cols[None, :] == i1[:, None]) * w1[:, None])


def resize_bilinear(x: jnp.ndarray,
                    size: Tuple[int, int],
                    align_corners: bool = False,
                    method: str = "auto",
                    scales: Optional[Tuple[float, float]] = None
                    ) -> jnp.ndarray:
    """Bilinear resize of NHWC ``x`` to ``size=(h, w)`` with torch semantics.

    Two lowering strategies, numerically identical weights:

    * ``gather`` — separable row/column gathers + fmas (VPU); best on CPU.
    * ``matmul`` — the classic TPU trick: interpolation as two dense
      matmuls with static (out, in) weight matrices, ``y = M_h · x · M_wᵀ``.
      Gathers are serialized memory traffic on TPU; these land on the MXU
      and run an order of magnitude faster for the wide-channel decode
      upsamples (e.g. 2048-ch stage-4 features → 512²).

    ``auto`` picks matmul on TPU, gather elsewhere.  Interpolation runs in
    float32 regardless of input dtype (bf16-safe), cast back at the end.
    """
    N, H, W, C = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if method == "auto":
        method = "matmul" if jax.default_backend() == "tpu" else "gather"
    sh, sw = scales if scales is not None else (None, None)

    if method == "matmul":
        Mh = _interp_matrix(H, h, align_corners, sh)
        Mw = _interp_matrix(W, w, align_corners, sw)
        if orig_dtype == jnp.bfloat16:
            # bf16 MXU fast path (measured 3.2x on TPU, docs/PERF.md round
            # 5): the inputs are already bf16-rounded, and bf16·bf16
            # products are exact inside the f32 accumulator (8-bit
            # mantissa products fit in 24 bits), so vs the f32 route the
            # only extra rounding is the bf16 handoff between the two
            # passes plus the weight cast (dyadic 2x weights are exact).
            y = jnp.einsum("oh,nhwc->nowc", Mh.astype(jnp.bfloat16), x,
                           preferred_element_type=jnp.float32)
            y = jnp.einsum("pw,nowc->nopc", Mw.astype(jnp.bfloat16),
                           y.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return y.astype(orig_dtype)
        # (h,H)·(N,H,W,C) over H, then (w,W)·(N,h,W,C) over W
        xf = jnp.einsum("oh,nhwc->nowc", Mh, xf,
                        precision=jax.lax.Precision.HIGHEST)
        xf = jnp.einsum("pw,nowc->nopc", Mw, xf,
                        precision=jax.lax.Precision.HIGHEST)
        return xf.astype(orig_dtype)

    i0, i1, wh = _bilinear_1d_weights(H, h, align_corners, sh)
    wh = wh[None, :, None, None]
    xf = jnp.take(xf, i0, axis=1) * (1 - wh) + jnp.take(xf, i1, axis=1) * wh

    j0, j1, ww = _bilinear_1d_weights(W, w, align_corners, sw)
    ww = ww[None, None, :, None]
    xf = jnp.take(xf, j0, axis=2) * (1 - ww) + jnp.take(xf, j1, axis=2) * ww
    return xf.astype(orig_dtype)


def _bicubic_1d_weights(in_size: int, out_size: int, align_corners: bool,
                        scale: Optional[float] = None):
    """Static 4-tap indices + cubic-convolution weights for one axis.

    torch's bicubic kernel (``upsample_bicubic2d``): cubic convolution with
    a = -0.75, taps at floor(src)+{-1,0,1,2}, border taps clamped
    (replicate).  Same coordinate rules as bilinear."""
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        step = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = dst * step
    else:
        step = (1.0 / scale) if scale else in_size / out_size
        # NOTE: unlike bilinear, torch does NOT clamp src at 0 for bicubic —
        # negative fractional coordinates keep their (replicated-tap) weights
        src = (dst + 0.5) * step - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = (src - i0)[:, None]                     # (out, 1)
    m = np.arange(-1, 3, dtype=np.float64)[None, :]   # taps (1, 4)
    ax = np.abs(m - t)                          # |x| per tap, (out, 4)
    a = -0.75
    w = np.where(
        ax <= 1.0, ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
        np.where(ax < 2.0, ((a * ax - 5.0 * a) * ax + 8.0 * a) * ax - 4.0 * a,
                 0.0))
    idx = np.clip(i0[:, None] + np.arange(-1, 3)[None, :], 0, in_size - 1)
    return idx.astype(np.int32), w.astype(np.float32)


def _bicubic_matrix(in_size: int, out_size: int, align_corners: bool,
                    scale: Optional[float] = None) -> jnp.ndarray:
    """Dense (out, in) cubic-interpolation matrix (≤4 nonzeros per row),
    built on device like ``_interp_matrix`` (clamped duplicate taps
    accumulate, preserving the weight sum of 1)."""
    idx, w = _bicubic_1d_weights(in_size, out_size, align_corners, scale)
    idx = jnp.asarray(idx)                       # (out, 4)
    w = jnp.asarray(w)
    cols = jnp.arange(in_size, dtype=jnp.int32)
    onehot = (cols[None, None, :] == idx[:, :, None]).astype(jnp.float32)
    return jnp.einsum("otc,ot->oc", onehot, w)


def resize_bicubic(x: jnp.ndarray,
                   size: Tuple[int, int],
                   align_corners: bool = False,
                   method: str = "auto",
                   scales: Optional[Tuple[float, float]] = None
                   ) -> jnp.ndarray:
    """Bicubic resize of NHWC ``x`` with torch ``F.interpolate`` semantics
    (a = -0.75 cubic convolution, replicated border taps).  Same two
    lowerings as ``resize_bilinear``; separable matmuls on TPU."""
    N, H, W, C = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if method == "auto":
        method = "matmul" if jax.default_backend() == "tpu" else "gather"
    sh, sw = scales if scales is not None else (None, None)

    if method == "matmul":
        Mh = _bicubic_matrix(H, h, align_corners, sh)
        Mw = _bicubic_matrix(W, w, align_corners, sw)
        xf = jnp.einsum("oh,nhwc->nowc", Mh, xf,
                        precision=jax.lax.Precision.HIGHEST)
        xf = jnp.einsum("pw,nowc->nopc", Mw, xf,
                        precision=jax.lax.Precision.HIGHEST)
        return xf.astype(orig_dtype)

    idx, wh = _bicubic_1d_weights(H, h, align_corners, sh)
    xf = sum(jnp.take(xf, idx[:, m], axis=1)
             * wh[None, :, m, None, None] for m in range(4))
    idx, ww = _bicubic_1d_weights(W, w, align_corners, sw)
    xf = sum(jnp.take(xf, idx[:, m], axis=2)
             * ww[None, None, :, m, None] for m in range(4))
    return xf.astype(orig_dtype)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int],
                   scales: Optional[Tuple[float, float]] = None
                   ) -> jnp.ndarray:
    """Nearest resize with torch's legacy ``floor(dst*step)`` rule; when a
    user scale_factor is known the step is ``1/scale`` (see
    _bilinear_1d_weights)."""
    N, H, W, C = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x
    sh, sw = scales if scales is not None else (None, None)
    step_h = (1.0 / sh) if sh else H / h
    step_w = (1.0 / sw) if sw else W / w
    rows = np.minimum(np.floor(np.arange(h) * step_h).astype(np.int32),
                      H - 1)
    cols = np.minimum(np.floor(np.arange(w) * step_w).astype(np.int32),
                      W - 1)
    return jnp.take(jnp.take(x, rows, axis=1), cols, axis=2)


def resize(input: jnp.ndarray,
           size: Optional[Sequence[int]] = None,
           scale_factor: Optional[Union[float, Tuple[float, float]]] = None,
           mode: str = "bilinear",
           align_corners: Optional[bool] = None,
           warning: bool = True) -> jnp.ndarray:
    """``F.interpolate``-compatible resize on NHWC tensors
    (reference utils/ops.py:7-26 including the align_corners advisory)."""
    N, H, W, C = input.shape
    scales = None
    if size is None:
        assert scale_factor is not None
        sf = (scale_factor, scale_factor) if not isinstance(
            scale_factor, (tuple, list)) else scale_factor
        size = (int(H * sf[0]), int(W * sf[1]))
        # torch keeps the user's scale for the coordinate mapping
        # (recompute_scale_factor default) — size ratio only when a size
        # was given
        scales = (float(sf[0]), float(sf[1]))
    size = tuple(int(s) for s in size)

    if warning and align_corners:
        oh, ow = size
        if ((oh > 1 and ow > 1 and H > 1 and W > 1)
                and (oh - 1) % (H - 1) and (ow - 1) % (W - 1)):
            warnings.warn(
                f"When align_corners={align_corners}, the output would be "
                f"more aligned if input size {(H, W)} and out size {size} "
                f"satisfy (out-1) % (in-1) == 0")

    if mode == "bilinear":
        return resize_bilinear(input, size, bool(align_corners),
                               scales=scales)
    if mode == "bicubic":
        return resize_bicubic(input, size, bool(align_corners),
                              scales=scales)
    if mode == "nearest":
        assert align_corners is None or align_corners is False
        return resize_nearest(input, size, scales=scales)
    raise ValueError(f"Unsupported resize mode {mode}")


class Upsample(nn.Module):
    """Module wrapper recomputing integer output size from ``scale_factor``
    at call time (reference utils/ops.py:48-69)."""

    size: Optional[Tuple[int, int]] = None
    scale_factor: Optional[Union[float, Tuple[float, float]]] = None
    mode: str = "nearest"
    align_corners: Optional[bool] = None

    def __call__(self, x, train: bool = False):
        if not self.size:
            sf = self.scale_factor
            sf = (sf, sf) if not isinstance(sf, (tuple, list)) else sf
            size = (int(x.shape[1] * sf[0]), int(x.shape[2] * sf[1]))
        else:
            size = self.size
        return resize(x, size=size, mode=self.mode,
                      align_corners=self.align_corners, warning=False)


def add_prefix(inputs: dict, prefix: str) -> dict:
    """``{k: v} → {f'{prefix}.{k}': v}`` (reference utils/ops.py:29-45)."""
    return {f"{prefix}.{name}": value for name, value in inputs.items()}
