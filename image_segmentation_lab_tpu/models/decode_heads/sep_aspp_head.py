"""DepthwiseSeparableASPPHead (DeepLabV3+).

The reference config ``deeplabv3plus_r50-d8.py:22`` names this head but the
reference never implements it (SURVEY.md §8.5) — only the building block
``DepthwiseSeparableConvModule`` exists.  This implements the standard
DeepLabV3+ decoder so that config runs: ASPP whose 3x3 branches are
depthwise-separable, a 1x1 ``c1_bottleneck`` on the low-level stage-0
feature, and two separable 3x3 fusion convs after upsample+concat
(per the DeepLabV3+ paper, arXiv:1802.02611).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from ..common.conv_module import ConvModule
from ..utils.depthwise_separable_conv_module import \
    DepthwiseSeparableConvModule
from .aspp_head import ASPPHead, ASPPModule


class DepthwiseSeparableASPPModule(ASPPModule):
    """ASPP with separable 3x3 atrous branches."""

    def setup(self):
        branches = []
        for dilation in self.dilations:
            if dilation == 1:
                branches.append(ConvModule(
                    self.in_channels, self.channels, 1,
                    conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                    act_cfg=self.act_cfg))
            else:
                branches.append(DepthwiseSeparableConvModule(
                    self.in_channels, self.channels, 3, dilation=dilation,
                    padding=dilation, norm_cfg=self.norm_cfg,
                    act_cfg=self.act_cfg))
        self.branches = branches


@DECODEHEAD.register()
class DepthwiseSeparableASPPHead(ASPPHead):
    c1_in_channels: int = 0
    c1_channels: int = 0

    def _build_aspp_module(self):
        return DepthwiseSeparableASPPModule(
            self.dilations, self.fused_in_channels, self.channels,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg())

    def setup(self):
        super().setup()
        assert self.c1_in_channels >= 0
        if self.c1_in_channels > 0:
            self.c1_bottleneck = ConvModule(
                self.c1_in_channels, self.c1_channels, 1,
                conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg())
        else:
            self.c1_bottleneck = None
        fuse_in = self.channels + (self.c1_channels
                                   if self.c1_in_channels > 0 else 0)
        self.sep_bottleneck = [
            DepthwiseSeparableConvModule(
                fuse_in, self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg()),
            DepthwiseSeparableConvModule(
                self.channels, self.channels, 3, padding=1,
                norm_cfg=self.norm_cfg, act_cfg=self._act_cfg()),
        ]

    def _forward_feature(self, inputs, train: bool = False):
        output = super()._forward_feature(inputs, train=train)
        if self.c1_bottleneck is not None:
            c1_output = self.c1_bottleneck(inputs[0], train=train)
            output = resize(output, size=c1_output.shape[1:3],
                            mode="bilinear", align_corners=self.align_corners)
            output = jnp.concatenate([output, c1_output], axis=-1)
        for conv in self.sep_bottleneck:
            output = conv(output, train=train)
        return output

    def __call__(self, inputs, train: bool = False):
        return self.cls_seg(self._forward_feature(inputs, train), train=train)
