"""Pooling ops on NHWC tensors with torch semantics.

The reference uses torch's MaxPool2d (resnet stem, resnet.py:641),
AvgPool2d(ceil_mode=True, count_include_pad=False) (ResLayer avg_down,
res_layer.py:62-66) and AdaptiveAvgPool2d (ASPP image pool aspp_head.py:80-88,
PPM psp_head.py:22-70, SELayer se_layer.py:75).  All are implemented with
``lax.reduce_window`` / static slicing so they compile to single fused XLA
ops; adaptive pooling uses torch's exact floor/ceil bin edges.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

IntPair = Union[int, Tuple[int, int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _pool_padding(size: int, k: int, s: int, p: int, ceil_mode: bool):
    """torch pooling pad spec (lo, hi) for one spatial dim."""
    if ceil_mode:
        out = -(-(size + 2 * p - k) // s) + 1
        # torch: last window must start inside the (left-padded) input
        if (out - 1) * s >= size + p:
            out -= 1
    else:
        out = (size + 2 * p - k) // s + 1
    needed = (out - 1) * s + k - size
    hi = max(needed - p, 0)
    return (p, hi), out


def max_pool2d(x: jnp.ndarray, kernel_size: IntPair, stride: IntPair = None,
               padding: IntPair = 0, ceil_mode: bool = False) -> jnp.ndarray:
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    ph, pw = _pair(padding)
    (pad_h, _), (pad_w, _) = _pool_padding(x.shape[1], kh, sh, ph, ceil_mode), \
        _pool_padding(x.shape[2], kw, sw, pw, ceil_mode)
    # -inf init is required for XLA to recognize the max-monoid (autodiff)
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), pad_h, pad_w, (0, 0)))


def avg_pool2d(x: jnp.ndarray, kernel_size: IntPair, stride: IntPair = None,
               padding: IntPair = 0, ceil_mode: bool = False,
               count_include_pad: bool = True) -> jnp.ndarray:
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    ph, pw = _pair(padding)
    pad_h, _ = _pool_padding(x.shape[1], kh, sh, ph, ceil_mode)
    pad_w, _ = _pool_padding(x.shape[2], kw, sw, pw, ceil_mode)
    pads = ((0, 0), pad_h, pad_w, (0, 0))
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1), padding=pads)
    if count_include_pad:
        # torch counts *explicit* padding (up to `p` per side) but not the
        # extra ceil_mode overhang.  Build a 0/1 coverage map matching the
        # summed array's padded extent (lo pad = p of ones; hi pad = up to p
        # ones for explicit padding, zeros for any ceil overhang beyond it).
        def hi_ones(hi, p):
            return min(hi, p), max(hi - p, 0)

        h1, h0 = hi_ones(pad_h[1], ph)
        w1, w0 = hi_ones(pad_w[1], pw)
        ones = jnp.ones((1,) + x.shape[1:3] + (1,), jnp.float32)
        ones = jnp.pad(ones, ((0, 0), (ph, h1), (pw, w1), (0, 0)),
                       constant_values=1.0)
        ones = jnp.pad(ones, ((0, 0), (0, h0), (0, w0), (0, 0)),
                       constant_values=0.0)
        count = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add, (1, kh, kw, 1), (1, sh, sw, 1),
            ((0, 0), (0, 0), (0, 0), (0, 0)))
    else:
        ones = jnp.ones((1,) + x.shape[1:3] + (1,), jnp.float32)
        count = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add, (1, kh, kw, 1), (1, sh, sw, 1),
            ((0, 0), pad_h, pad_w, (0, 0)))
    return (summed / count).astype(x.dtype)


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: IntPair) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d: bin i covers [floor(i*H/oh), ceil((i+1)*H/oh))."""
    oh, ow = _pair(output_size)
    N, H, W, C = x.shape
    if (oh, ow) == (1, 1):
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                        keepdims=True).astype(x.dtype)
    if H % oh == 0 and W % ow == 0:
        # uniform bins → plain average pooling (single XLA op)
        return avg_pool2d(x, (H // oh, W // ow), (H // oh, W // ow))
    xf = x.astype(jnp.float32)
    rows = []
    for i in range(oh):
        h0 = (i * H) // oh
        h1 = -((-(i + 1) * H) // oh)  # ceil((i+1)*H / oh)
        cols = []
        for j in range(ow):
            w0 = (j * W) // ow
            w1 = -((-(j + 1) * W) // ow)
            cols.append(jnp.mean(xf[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    out = jnp.stack(rows, axis=1)  # (N, oh, ow, C)
    return out.astype(x.dtype)
