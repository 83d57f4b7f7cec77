"""FCNHead (reference ``models/decode_heads/fcn_head.py:1-100``).

``num_convs`` stacked ConvModules with dilation-aware padding (:49-62),
optional ``concat_input`` conv_cat fusing input+output (:68-76), identity
when ``num_convs == 0`` (:64-65).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.registry_hub import DECODEHEAD
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


@DECODEHEAD.register()
class FCNHead(BaseDecodeHead):
    num_convs: int = 2
    kernel_size: int = 3
    concat_input: bool = True
    dilation: int = 1

    def setup(self):
        assert self.num_convs >= 0 and self.dilation > 0
        if self.num_convs == 0:
            assert self.fused_in_channels == self.channels
        super().setup()
        conv_padding = (self.kernel_size // 2) * self.dilation
        convs = []
        in_ch = self.fused_in_channels
        for i in range(self.num_convs):
            convs.append(ConvModule(
                in_ch if i == 0 else self.channels, self.channels,
                self.kernel_size, padding=conv_padding, dilation=self.dilation,
                conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg()))
        self.convs = convs
        if self.concat_input:
            self.conv_cat = ConvModule(
                self.fused_in_channels + self.channels, self.channels,
                self.kernel_size, padding=self.kernel_size // 2,
                conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg())

    def _forward_feature(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        feats = x
        for conv in self.convs:
            feats = conv(feats, train=train)
        if self.concat_input:
            feats = self.conv_cat(jnp.concatenate([x, feats], axis=-1),
                                  train=train)
        return feats

    def __call__(self, inputs, train: bool = False):
        return self.cls_seg(self._forward_feature(inputs, train), train=train)
