"""Point-wise Spatial Attention decode head (PSANet — Zhao et al.,
ECCV 2018; mmseg ``PSAHead`` + mmcv ``PSAMask`` semantics).

Beyond-reference family.  The reference ecosystem's PSAMask is a CUDA
scatter kernel; here it is a *static channel gather*: for feature
position a and output channel b, the over-complete (mask_h x mask_w)
attention plane at a contributes its (b - a + half) tap iff that offset
lies inside the mask — a compile-time (L, L) index/valid table folded
into one ``take_along_axis`` (TPU gather, index-count-bound) plus a
zero select.  'collect' keeps the gather layout; 'distribute' is its
(a, b) transpose.  After the channel softmax both directions aggregate
with the SAME batched MXU einsum.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from ..basic.convolution import Conv2d
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


def psa_mask(x: jnp.ndarray, mask_size: Tuple[int, int],
             psa_type: str) -> jnp.ndarray:
    """mmcv ``PSAMask`` forward on NHWC input (N, h, w, mask_h*mask_w).

    Returns (N, h, w, h*w).  Derived from the reference CUDA loops:
    collect writes out[n, (a+off-half), a] = in[n, off, a]; distribute
    writes out[n, a, (a+off-half)] = in[n, off, a]; both zero-fill
    out-of-mask offsets.
    """
    N, h, w, M = x.shape
    mask_h, mask_w = mask_size
    assert M == mask_h * mask_w, (M, mask_size)
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
    L = h * w
    # The (L, L) offset table is built from iota ON DEVICE — as a folded
    # numpy literal it would be ~4·L² bytes in the program and blow the
    # tunnel's remote-compile request limit at head resolutions.
    pos = jnp.arange(L, dtype=jnp.int32)
    ai, aj = pos // w, pos % w
    dh = ai[None, :] - ai[:, None] + half_h          # offset of b rel. a
    dw = aj[None, :] - aj[:, None] + half_w
    valid = ((0 <= dh) & (dh < mask_h)) & ((0 <= dw) & (dw < mask_w))
    idx = (jnp.clip(dh, 0, mask_h - 1) * mask_w
           + jnp.clip(dw, 0, mask_w - 1))

    g = jnp.take_along_axis(x.reshape(N, L, M), idx[None], axis=2)
    g = jnp.where(valid[None], g, jnp.zeros((), g.dtype))
    if psa_type == "distribute":
        g = g.transpose(0, 2, 1)
    return g.reshape(N, h, w, L)


@DECODEHEAD.register()
class PSAHead(BaseDecodeHead):
    """mmseg ``PSAHead``: collect / distribute / bi-direction attention."""

    mask_size: Tuple[int, int] = (97, 97)
    psa_type: str = "bi-direction"
    compact: bool = False
    shrink_factor: int = 2
    normalization_factor: float = 1.0
    psa_softmax: bool = True

    def setup(self):
        super().setup()
        assert self.psa_type in ("collect", "distribute", "bi-direction")
        mask_h, mask_w = self.mask_size
        kw = dict(conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                  act_cfg=self._act_cfg())
        self.reduce = ConvModule(self.fused_in_channels, self.channels, 1,
                                 **kw)
        self.attention = [
            ConvModule(self.channels, self.channels, 1, **kw),
            Conv2d(self.channels, mask_h * mask_w, 1, bias=False),
        ]
        if self.psa_type == "bi-direction":
            self.reduce_p = ConvModule(self.fused_in_channels, self.channels,
                                       1, **kw)
            self.attention_p = [
                ConvModule(self.channels, self.channels, 1, **kw),
                Conv2d(self.channels, mask_h * mask_w, 1, bias=False),
            ]
        self.proj = ConvModule(
            self.channels * (2 if self.psa_type == "bi-direction" else 1),
            self.fused_in_channels, 1, **kw)
        self.bottleneck = ConvModule(
            self.fused_in_channels * 2, self.channels, 3, padding=1, **kw)

    def _shrink(self, out, align_corners):
        """mmseg's shrink quirk: odd sizes flip align_corners to True."""
        n, h, w, c = out.shape
        sf = self.shrink_factor
        if sf != 1:
            if h % sf and w % sf:
                h = (h - 1) // sf + 1
                w = (w - 1) // sf + 1
                align_corners = True
            else:
                h, w = h // sf, w // sf
                align_corners = False
            out = resize(out, size=(h, w), mode="bilinear",
                         align_corners=align_corners)
        return out, align_corners

    def _attend(self, feat, attention, psa_type, compact_transpose, train):
        """Shrunk feature → masked/softmaxed attention → aggregation.

        ``compact_transpose`` mirrors mmseg's asymmetric compact rule:
        single-direction transposes 'collect', bi-direction transposes
        only the distribute branch (psa_head.py upstream).
        """
        N, h, w, C = feat.shape
        L = h * w
        y = attention[1](attention[0](feat, train=train))
        if self.compact:
            if compact_transpose:
                y = (y.reshape(N, L, L).transpose(0, 2, 1)
                     .reshape(N, h, w, L))
        else:
            y = psa_mask(y, self.mask_size, psa_type)
        if self.psa_softmax:
            y = nn.softmax(y.astype(jnp.float32), axis=-1).astype(feat.dtype)
        out = jnp.einsum("nqs,nsc->nqc", y.reshape(N, L, L),
                         feat.reshape(N, L, C),
                         preferred_element_type=jnp.float32)
        out = out.astype(feat.dtype) * (1.0 / self.normalization_factor)
        return out.reshape(N, h, w, C)

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        identity = x
        align_corners = self.align_corners
        if self.psa_type in ("collect", "distribute"):
            out = self.reduce(x, train=train)
            out, align_corners = self._shrink(out, align_corners)
            out = self._attend(out, self.attention, self.psa_type,
                               self.psa_type == "collect", train)
        else:
            x_col = self.reduce(x, train=train)
            x_dis = self.reduce_p(x, train=train)
            x_col, align_corners = self._shrink(x_col, align_corners)
            x_dis, _ = self._shrink(x_dis, align_corners)
            x_col = self._attend(x_col, self.attention, "collect", False,
                                 train)
            x_dis = self._attend(x_dis, self.attention_p, "distribute",
                                 True, train)
            out = jnp.concatenate([x_col, x_dis], axis=-1)
        out = self.proj(out, train=train)
        out = resize(out, size=identity.shape[1:3], mode="bilinear",
                     align_corners=align_corners)
        out = self.bottleneck(jnp.concatenate([identity, out], axis=-1),
                              train=train)
        return self.cls_seg(out, train=train)
