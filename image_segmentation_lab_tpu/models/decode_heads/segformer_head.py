"""SegFormerHead — the all-MLP decoder from SegFormer (Xie et al., 2021).

Beyond-reference addition (the reference lab has no transformer family):
each of the four MiT scales is projected to ``channels`` with a 1x1
ConvModule, bilinearly resized to the largest (1/4) scale, concatenated,
fused with one more 1x1 ConvModule, and classified by ``cls_seg`` — four
pointwise matmuls plus resizes, all MXU/VPU work in NHWC.

Follows the framework's BaseDecodeHead contract (input_transform
='multiple_select', losses/sampler/binary handling inherited); the resize
uses the shared MXU-matmul bilinear (`utils/ops.resize`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


@DECODEHEAD.register()
class SegFormerHead(BaseDecodeHead):
    interpolate_mode: str = "bilinear"

    def setup(self):
        super().setup()
        assert self.input_transform == "multiple_select", (
            "SegFormerHead fuses multiple scales; set "
            "input_transform='multiple_select'")
        assert len(self.in_channels) == len(self.in_index)
        self.scale_convs = [
            ConvModule(in_ch, self.channels, 1, conv_cfg=self.conv_cfg,
                       norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())
            for in_ch in self.in_channels
        ]
        self.fusion_conv = ConvModule(
            self.channels * len(self.in_channels), self.channels, 1,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        xs = self._transform_inputs(inputs)  # list of NHWC maps
        target_hw = xs[0].shape[1:3]
        fused = [
            resize(conv(x, train=train), size=target_hw,
                   mode=self.interpolate_mode,
                   align_corners=self.align_corners)
            for conv, x in zip(self.scale_convs, xs)
        ]
        out = self.fusion_conv(jnp.concatenate(fused, axis=-1), train=train)
        return self.cls_seg(out, train=train)
