"""PSPHead + PPM (reference ``models/decode_heads/psp_head.py:1-128``).

PPM: per pool-scale AdaptiveAvgPool + 1x1 ConvModule, bilinear-upsampled
back to the input size (:22-70); concat [x, ppm...] → 3x3 bottleneck
(:106-122).  Unlike the reference — where this head only registers if
``psp_head`` happens to be imported transitively via icnet (SURVEY.md §2.5) —
it is always registered here.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...ops.pooling import adaptive_avg_pool2d
from ...utils.ops import resize
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


class PPM(nn.Module):
    """Pyramid pooling module (reference psp_head.py:22-70)."""

    pool_scales: Sequence[int]
    in_channels: int
    channels: int
    conv_cfg: dict = None
    norm_cfg: dict = None
    act_cfg: dict = None
    align_corners: bool = False

    def setup(self):
        self.branches = [
            ConvModule(self.in_channels, self.channels, 1,
                       conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg)
            for _ in self.pool_scales
        ]

    def __call__(self, x, train: bool = False):
        outs = []
        for scale, conv in zip(self.pool_scales, self.branches):
            out = conv(adaptive_avg_pool2d(x, scale), train=train)
            outs.append(resize(out, size=x.shape[1:3], mode="bilinear",
                               align_corners=self.align_corners))
        return outs


@DECODEHEAD.register()
class PSPHead(BaseDecodeHead):
    pool_scales: Sequence[int] = (1, 2, 3, 6)

    def setup(self):
        super().setup()
        self.psp_modules = PPM(
            self.pool_scales, self.fused_in_channels, self.channels,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg(), align_corners=self.align_corners)
        self.bottleneck = ConvModule(
            self.fused_in_channels + len(self.pool_scales) * self.channels,
            self.channels, 3, padding=1, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())

    def _forward_feature(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        psp_outs = [x] + self.psp_modules(x, train=train)
        return self.bottleneck(jnp.concatenate(psp_outs, axis=-1),
                               train=train)

    def __call__(self, inputs, train: bool = False):
        return self.cls_seg(self._forward_feature(inputs, train), train=train)
