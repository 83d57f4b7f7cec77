"""Panoptic-FPN semantic decode head (Kirillov et al., CVPR 2019; mmseg
``FPNHead`` semantics).

Beyond-reference family: consumes the FPN neck's pyramid
(``input_transform='multiple_select'``); each level gets a scale head of
repeated [3x3 ConvModule (+2x bilinear upsample)] stages until it
reaches the finest stride, the per-level outputs are summed, and the
classifier runs at the finest (1/4) scale.  The stage-1 head of the
PointRend cascade.
"""

from __future__ import annotations

import numpy as np

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import Upsample
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


@DECODEHEAD.register()
class FPNHead(BaseDecodeHead):
    feature_strides: tuple = None     # stride of each selected level

    def setup(self):
        assert self.feature_strides is not None, "feature_strides required"
        assert len(self.feature_strides) == len(self.in_channels)
        assert min(self.feature_strides) == self.feature_strides[0]
        super().setup()
        heads = []
        for i in range(len(self.feature_strides)):
            head_length = max(
                1, int(np.log2(self.feature_strides[i])
                       - np.log2(self.feature_strides[0])))
            ops = []
            for k in range(head_length):
                ops.append(ConvModule(
                    self.in_channels[i] if k == 0 else self.channels,
                    self.channels, 3, padding=1, conv_cfg=self.conv_cfg,
                    norm_cfg=self.norm_cfg, act_cfg=self._act_cfg()))
                if self.feature_strides[i] != self.feature_strides[0]:
                    ops.append(Upsample(scale_factor=2, mode="bilinear",
                                        align_corners=self.align_corners))
            heads.append(ops)
        self.scale_heads = heads

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)   # multiple_select list
        out = None
        for i, ops in enumerate(self.scale_heads):
            y = x[i]
            for op in ops:
                y = op(y, train=train) if isinstance(op, ConvModule) \
                    else op(y)
            out = y if out is None else out + y
        return self.cls_seg(out, train=train)
