"""ASPPHead (reference ``models/decode_heads/aspp_head.py:1-133``).

``ASPPModule``: one ConvModule per dilation (1x1 for d==1 else 3x3 with
padding=dilation) (:22-61); ``image_pool`` = global AdaptiveAvgPool + 1x1
ConvModule upsampled back (:80-88); concat [pool, aspp...] → 3x3 bottleneck
(:106-127).  All branches are independent MXU convs over the same feature
map — XLA schedules them concurrently; the concat+bottleneck fuses the merge.
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


class ASPPModule(nn.Module):
    """Atrous conv branches (reference aspp_head.py:22-61)."""

    dilations: Sequence[int]
    in_channels: int
    channels: int
    conv_cfg: dict = None
    norm_cfg: dict = None
    act_cfg: dict = None

    def setup(self):
        self.branches = [
            ConvModule(
                self.in_channels, self.channels,
                1 if dilation == 1 else 3,
                dilation=dilation,
                padding=0 if dilation == 1 else dilation,
                conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg)
            for dilation in self.dilations
        ]

    def __call__(self, x, train: bool = False):
        return [branch(x, train=train) for branch in self.branches]


@DECODEHEAD.register()
class ASPPHead(BaseDecodeHead):
    dilations: Sequence[int] = (1, 6, 12, 18)

    def _build_aspp_module(self):
        """Hook so DepthwiseSeparableASPPHead can swap in separable branches."""
        return ASPPModule(
            self.dilations, self.fused_in_channels, self.channels,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg())

    def setup(self):
        super().setup()
        self.image_pool_conv = ConvModule(
            self.fused_in_channels, self.channels, 1, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())
        self.aspp_modules = self._build_aspp_module()
        self.bottleneck = ConvModule(
            (len(self.dilations) + 1) * self.channels, self.channels, 3,
            padding=1, conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg())

    def _forward_feature(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        pooled = self.image_pool_conv(adaptive_avg_pool2d(x, 1), train=train)
        aspp_outs = [resize(pooled, size=x.shape[1:3], mode="bilinear",
                            align_corners=self.align_corners)]
        aspp_outs.extend(self.aspp_modules(x, train=train))
        aspp_outs = jnp.concatenate(aspp_outs, axis=-1)
        return self.bottleneck(aspp_outs, train=train)

    def __call__(self, inputs, train: bool = False):
        return self.cls_seg(self._forward_feature(inputs, train), train=train)
