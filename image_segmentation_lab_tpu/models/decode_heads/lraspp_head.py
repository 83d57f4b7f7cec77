"""LR-ASPP head (Lite Reduced ASPP, MobileNetV3 paper arXiv:1905.02244 §5.2).

Not present in the reference lab; added so the MobileNetV3 backbone has its
canonical segmentation decoder.  Two-branch design over a low-level and a
high-level feature (os8/os16 in the paper; with a dilated d8 backbone both
arrive at os8 and the upsample is an identity):

* high branch: 1x1 conv+BN+ReLU → gated by a squeeze path
  (global average pool → 1x1 conv → sigmoid), upsampled to the low level;
* low branch: 1x1 conv straight to class logits;
* output = classifier(high) + low logits.

Config contract: ``input_transform='multiple_select'``,
``in_index=(low, high)``, ``in_channels=[low_c, high_c]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.initialize.init_functions import constant_, normal_
from ...core.registry_hub import DECODEHEAD
from ...ops.pooling import adaptive_avg_pool2d
from ...utils.ops import resize
from ..basic.convolution import Conv2d
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


@DECODEHEAD.register()
class LRASPPHead(BaseDecodeHead):

    def setup(self):
        assert self.input_transform == "multiple_select" and len(
            self.in_channels) == 2, (
            "LRASPPHead needs input_transform='multiple_select' with "
            "in_channels=[low_level_c, high_level_c]")
        super().setup()
        low_c, high_c = self.in_channels
        self.high_conv = ConvModule(high_c, self.channels, 1,
                                    conv_cfg=self.conv_cfg,
                                    norm_cfg=self.norm_cfg,
                                    act_cfg=self._act_cfg())
        self.scale_conv = ConvModule(high_c, self.channels, 1,
                                     conv_cfg=self.conv_cfg,
                                     act_cfg=dict(type="Sigmoid"))
        self.low_cls = Conv2d(low_c, self.resolved_out_channels(), 1,
                              weight_init=normal_(0, 0.01),
                              bias_init=constant_(0.0))

    def __call__(self, inputs, train: bool = False):
        low, high = self._transform_inputs(inputs)
        a = self.high_conv(high, train=train)
        gate = self.scale_conv(adaptive_avg_pool2d(high, 1), train=train)
        a = a * gate
        a = resize(a, size=low.shape[1:3], mode="bilinear",
                   align_corners=self.align_corners)
        return self.cls_seg(a, train=train) + self.low_cls(low, train=train)
