"""Dynamic Multi-scale decode head (DMNet — He et al., ICCV 2019;
mmseg ``DMHead`` + DCM semantics).

Beyond-reference family.  Each Dynamic Convolutional Module (one per
filter size k) generates a per-sample depthwise k x k filter from the
adaptively pooled input and filters the reduced features with it.
mmseg runs this as a grouped conv with ``groups = N * C``; here the
dynamic depthwise conv is a *shifted-sum*: k² statically shifted slices
of the padded input, each FMA'd with its per-(sample, channel) filter
tap — full-lane VPU work with no grouped-conv reshape, accumulated in
f32 exactly like torch's conv2d (k ≤ 7 → ≤ 49 fused multiply-adds).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...ops.pooling import adaptive_avg_pool2d
from ..basic.convolution import Conv2d
from ..builder import build_activation_layer, build_norm_layer
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


def dynamic_depthwise_conv(x: jnp.ndarray, filt: jnp.ndarray,
                           k: int) -> jnp.ndarray:
    """Per-sample depthwise k x k cross-correlation.

    ``x`` is (N, H, W, C); ``filt`` is (N, k, k, C).  Padding follows
    mmseg DCM: symmetric for odd k, (pad+1, pad) left/top-heavy for
    even k, constant zero fill.
    """
    pad = (k - 1) // 2
    lo, hi = (pad, pad) if (k - 1) % 2 == 0 else (pad + 1, pad)
    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    out = jnp.zeros(x.shape, jnp.float32)
    for i in range(k):
        for j in range(k):
            tap = filt[:, i:i + 1, j:j + 1, :].astype(jnp.float32)
            out = out + xp[:, i:i + H, j:j + W, :].astype(jnp.float32) * tap
    return out.astype(x.dtype)


class DCM(nn.Module):
    """Dynamic Convolutional Module (mmseg ``DCM``)."""

    filter_size: int
    fusion: bool
    in_channels: int
    channels: int
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    def setup(self):
        kw = dict(conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                  act_cfg=self.act_cfg)
        self.filter_gen_conv = Conv2d(self.in_channels, self.channels, 1)
        self.input_redu_conv = ConvModule(self.in_channels, self.channels,
                                          1, **kw)
        if self.norm_cfg is not None:
            _, self.norm = build_norm_layer(dict(self.norm_cfg),
                                            self.channels)
        else:
            self.norm = None
        self.activate = (build_activation_layer(dict(self.act_cfg))
                         if self.act_cfg is not None else None)
        if self.fusion:
            self.fusion_conv = ConvModule(self.channels, self.channels, 1,
                                          **kw)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        filt = self.filter_gen_conv(
            adaptive_avg_pool2d(x, self.filter_size))   # (N, k, k, C)
        x = self.input_redu_conv(x, train=train)
        out = dynamic_depthwise_conv(x, filt, self.filter_size)
        if self.norm is not None:
            out = self.norm(out, train=train)
        if self.activate is not None:
            out = self.activate(out, train=train)
        if self.fusion:
            out = self.fusion_conv(out, train=train)
        return out


@DECODEHEAD.register()
class DMHead(BaseDecodeHead):
    """mmseg ``DMHead``: concat [x, DCM(k) per filter size] → bottleneck."""

    filter_sizes: Sequence[int] = (1, 3, 5, 7)
    fusion: bool = False

    def setup(self):
        super().setup()
        self.dcm_modules = [
            DCM(k, self.fusion, self.fused_in_channels, self.channels,
                conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg())
            for k in self.filter_sizes
        ]
        self.bottleneck = ConvModule(
            self.fused_in_channels + len(self.filter_sizes) * self.channels,
            self.channels, 3, padding=1, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        outs = [x] + [dcm(x, train=train) for dcm in self.dcm_modules]
        out = self.bottleneck(jnp.concatenate(outs, axis=-1), train=train)
        return self.cls_seg(out, train=train)
