"""UPerHead — Unified Perceptual Parsing decode head (Xiao et al., 2018).

Beyond-reference addition (the reference lab ships FCN/ASPP/PSP heads
only): the standard multi-scale fusion head pairing with both CNN and
transformer backbones.  Composition of parts this framework already has:

* PPM (``psp_head.PPM``) + 3x3 bottleneck on the coarsest input — the
  PSP-style global context branch;
* an FPN over all inputs: 1x1 lateral projections, top-down pathway adding
  bilinearly upsampled coarser levels (shared MXU-matmul resize), 3x3
  smoothing convs;
* all pyramid levels upsampled to the finest scale, concatenated and fused
  by one 3x3 bottleneck before ``cls_seg``.

NHWC end-to-end; every conv is a ConvModule so conv/norm/act cfgs and the
frozen-param routing behave like every other head in the zoo.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead
from .psp_head import PPM


@DECODEHEAD.register()
class UPerHead(BaseDecodeHead):
    pool_scales: Sequence[int] = (1, 2, 3, 6)

    def setup(self):
        super().setup()
        assert self.input_transform == "multiple_select", (
            "UPerHead fuses multiple scales; set "
            "input_transform='multiple_select'")
        assert len(self.in_channels) == len(self.in_index) >= 2

        # PSP branch on the coarsest level
        self.psp_modules = PPM(
            self.pool_scales, self.in_channels[-1], self.channels,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg(), align_corners=self.align_corners)
        self.psp_bottleneck = ConvModule(
            self.in_channels[-1] + len(self.pool_scales) * self.channels,
            self.channels, 3, padding=1, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())

        # FPN branch on the finer levels
        self.lateral_convs = [
            ConvModule(in_ch, self.channels, 1, conv_cfg=self.conv_cfg,
                       norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())
            for in_ch in self.in_channels[:-1]
        ]
        self.fpn_convs = [
            ConvModule(self.channels, self.channels, 3, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                       act_cfg=self._act_cfg())
            for _ in self.in_channels[:-1]
        ]
        self.fpn_bottleneck = ConvModule(
            len(self.in_channels) * self.channels, self.channels, 3,
            padding=1, conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg())

    def psp_forward(self, inputs, train: bool = False):
        x = inputs[-1]
        psp_outs = [x] + self.psp_modules(x, train=train)
        return self.psp_bottleneck(jnp.concatenate(psp_outs, axis=-1),
                                   train=train)

    def _forward_feature(self, inputs, train: bool = False):
        inputs = self._transform_inputs(inputs)

        laterals = [conv(inputs[i], train=train)
                    for i, conv in enumerate(self.lateral_convs)]
        laterals.append(self.psp_forward(inputs, train=train))

        # top-down pathway (coarse → fine, in-place adds in the reference
        # UPerNet; pure adds here)
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize(
                laterals[i], size=laterals[i - 1].shape[1:3],
                mode="bilinear", align_corners=self.align_corners)

        fpn_outs = [self.fpn_convs[i](laterals[i], train=train)
                    for i in range(len(laterals) - 1)]
        fpn_outs.append(laterals[-1])  # the PSP level is already smoothed

        target_hw = fpn_outs[0].shape[1:3]
        fpn_outs = [fpn_outs[0]] + [
            resize(out, size=target_hw, mode="bilinear",
                   align_corners=self.align_corners)
            for out in fpn_outs[1:]
        ]
        return self.fpn_bottleneck(jnp.concatenate(fpn_outs, axis=-1),
                                   train=train)

    def __call__(self, inputs, train: bool = False):
        return self.cls_seg(self._forward_feature(inputs, train), train=train)
