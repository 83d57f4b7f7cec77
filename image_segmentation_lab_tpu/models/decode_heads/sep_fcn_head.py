"""Depthwise-separable FCN head (Fast-SCNN classifier; mmseg
``DepthwiseSeparableFCNHead`` semantics): FCNHead with every ConvModule
swapped for a DepthwiseSeparableConvModule — the realtime family's
cheap classifier."""

from __future__ import annotations

from ...core.registry_hub import DECODEHEAD
from ..utils.depthwise_separable_conv_module import \
    DepthwiseSeparableConvModule
from .fcn_head import FCNHead


@DECODEHEAD.register()
class DepthwiseSeparableFCNHead(FCNHead):

    def setup(self):
        # BaseDecodeHead setup (losses, conv_seg, dropout), skipping
        # FCNHead's conv construction which we replace wholesale
        assert self.num_convs >= 1 and self.dilation > 0
        super(FCNHead, self).setup()
        pad = (self.kernel_size // 2) * self.dilation
        convs = []
        in_ch = self.fused_in_channels
        for i in range(self.num_convs):
            convs.append(DepthwiseSeparableConvModule(
                in_ch if i == 0 else self.channels, self.channels,
                self.kernel_size, padding=pad, dilation=self.dilation,
                norm_cfg=self.norm_cfg, act_cfg=self._act_cfg()))
        self.convs = convs
        if self.concat_input:
            self.conv_cat = DepthwiseSeparableConvModule(
                self.fused_in_channels + self.channels, self.channels,
                self.kernel_size, padding=self.kernel_size // 2,
                norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())
