"""Large-dilation 3x3 SAME conv as center matmul + boundary-slab matmuls.

The ASPP head (reference ``models/decode_heads/aspp_head.py:31-43``) runs
3x3 convs at dilations 12/24/36 over the d8 feature map (40x40 for a 320
crop).  With zero SAME padding, a tap offset by ``d`` falls outside the map
for all but ``H - d`` of the ``H`` output rows — at d=36 on a 40-row map,
8/9 of the conv's MACs multiply zeros.  ``lax.conv_general_dilated`` (and
cuDNN, which the reference rides) computes them anyway.

This module computes the *identical* result as

* one full-map 1x1 matmul for the center tap, plus
* up to 8 slab matmuls of shape ``(H-d, W)`` / ``(H, W-d)`` / ``(H-d, W-d)``
  for the off-center taps (skipped entirely when ``d >= H`` or ``d >= W``),

accumulated with ``.at[].add``.  Everything is a dense MXU matmul; only the
zero-by-construction work disappears.

**Measured (v5e, bf16, in-jit amortized):** the flagship head's three
dilated convs on a (256, 40, 40, 2048) window batch drop from 125.5 ms
(lax) to 53.0 ms (2.37x); max rel error 1.6e-7 in f32 (accumulation-order
noise).  ``worth_it`` gates on the MAC ratio so small dilations (backbone
d8 stages, d=2/4) keep the native conv path.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

_TAPS = [(ky, kx) for ky in (-1, 0, 1) for kx in (-1, 0, 1)
         if (ky, kx) != (0, 0)]


def slab_macs_ratio(h: int, w: int, d: int) -> float:
    """MACs of the slab decomposition relative to the dense 3x3 conv."""
    hh, ww = max(h - d, 0), max(w - d, 0)
    slab = h * w + 2 * hh * w + 2 * h * ww + 4 * hh * ww
    return slab / (9 * h * w)


def worth_it(h: int, w: int, d: int, threshold: float = 0.8) -> bool:
    """True when the decomposition saves enough MACs to beat the extra
    scatter-add traffic.  Empirical: raising the threshold to 0.95 (which
    pulls in the backbone's d=2/4 stages, MAC ratios 0.93/0.87) makes the
    R50-d8 backbone 28% SLOWER (178 vs 139 ms on the 256-window batch) —
    the native conv wins when most taps do real work.

    ``ISLT_NO_SLAB_CONV=1`` disables the path entirely (escape hatch /
    A-B harness)."""
    if os.environ.get("ISLT_NO_SLAB_CONV"):
        return False
    return d > 1 and slab_macs_ratio(h, w, d) <= threshold


def dilated_conv3x3_same(x: jnp.ndarray, weight: jnp.ndarray,
                         d: int) -> jnp.ndarray:
    """3x3 stride-1 SAME conv with dilation ``d`` on NHWC ``x``.

    ``weight`` is HWIO ``(3, 3, Cin, Cout)``.  Bit-equivalent (up to
    accumulation order) to ``lax.conv_general_dilated(..., padding='SAME',
    rhs_dilation=(d, d))``.
    """
    _, h, w, _ = x.shape
    # Accumulate all 9 taps in f32 and round once at the end, matching
    # lax.conv_general_dilated's accumulator semantics — otherwise bf16
    # inputs would round per-tap and numerics would vary with input size
    # (worth_it gates on (h, w, d)).
    acc = jnp.float32
    out = jnp.einsum("nhwc,co->nhwo", x, weight[1, 1],
                     preferred_element_type=acc)
    for ky, kx in _TAPS:
        dy, dx = d * ky, d * kx
        if abs(dy) >= h or abs(dx) >= w:
            continue  # tap entirely in the zero padding
        oy0, oy1 = max(0, -dy), min(h, h - dy)
        ox0, ox1 = max(0, -dx), min(w, w - dx)
        src = x[:, oy0 + dy:oy1 + dy, ox0 + dx:ox1 + dx, :]
        contrib = jnp.einsum("nhwc,co->nhwo", src, weight[ky + 1, kx + 1],
                             preferred_element_type=acc)
        out = out.at[:, oy0:oy1, ox0:ox1, :].add(contrib)
    return out.astype(jnp.result_type(x.dtype, weight.dtype))
