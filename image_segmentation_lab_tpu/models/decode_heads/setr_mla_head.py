"""SETR multi-level-aggregation decode head (Zheng et al., CVPR 2021;
mmseg ``SETRMLAHead`` semantics).

Beyond-reference addition completing the SETR family (Naive/PUP ship in
``setr_up_head.py``): pairs the ``MLANeck`` — each aggregated level gets
two 3x3 convs and a 4x bilinear upsample, the branches concatenate, and
the classifier runs on the concat (``channels`` must equal
``len(in_channels) * mla_channels``, as upstream asserts).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import Upsample
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


@DECODEHEAD.register()
class SETRMLAHead(BaseDecodeHead):
    mla_channels: int = 128
    up_scale: int = 4

    def setup(self):
        super().setup()
        assert self.input_transform == "multiple_select"
        num_inputs = len(self.in_channels)
        assert self.channels == num_inputs * self.mla_channels, (
            "SETRMLAHead needs channels == len(in_channels) * mla_channels "
            f"(got {self.channels} != {num_inputs} * {self.mla_channels})")
        self.up_convs = [
            (ConvModule(self.in_channels[i], self.mla_channels, 3,
                        padding=1, norm_cfg=self.norm_cfg,
                        act_cfg=self._act_cfg()),
             ConvModule(self.mla_channels, self.mla_channels, 3, padding=1,
                        norm_cfg=self.norm_cfg, act_cfg=self._act_cfg()),
             Upsample(scale_factor=self.up_scale, mode="bilinear",
                      align_corners=self.align_corners))
            for i in range(num_inputs)
        ]

    def __call__(self, inputs, train: bool = False):
        feats = self._transform_inputs(inputs)
        outs = []
        for x, (c1, c2, up) in zip(feats, self.up_convs):
            outs.append(up(c2(c1(x, train=train), train=train)))
        out = jnp.concatenate(outs, axis=-1)
        return self.cls_seg(out, train=train)
