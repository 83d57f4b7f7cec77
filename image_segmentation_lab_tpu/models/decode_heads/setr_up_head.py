"""SETR progressive-upsampling decode head (Zheng et al., CVPR 2021).

Beyond-reference addition, pairing the ViT backbone
(``models/backbones/vit.py``): the "Naive" head is ``num_convs=1,
up_scale=4`` (one conv + 4x bilinear), "PUP" is ``num_convs=4,
up_scale=2`` (alternating conv / 2x upsampling so the isotropic 1/16
ViT map reaches full resolution progressively).  An input LayerNorm
tames the unnormalized transformer output before the conv stack —
trivially cheap in NHWC where channels already sit on the lane axis.

TPU notes: upsampling is the framework's separable-matmul bilinear
(MXU), and the conv/norm/act stack is ordinary ConvModule machinery, so
the whole head fuses into the usual conv pipeline.
"""

from __future__ import annotations

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import Upsample
from ..basic.normalization import LayerNorm
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


@DECODEHEAD.register()
class SETRUPHead(BaseDecodeHead):
    num_convs: int = 1
    up_scale: int = 4
    kernel_size: int = 3

    def setup(self):
        assert self.kernel_size in (1, 3), "kernel_size must be 1 or 3"
        assert self.num_convs >= 1
        super().setup()
        self.in_norm = LayerNorm(self.fused_in_channels, name="in_norm")
        convs, ups = [], []
        in_ch = self.fused_in_channels
        for _ in range(self.num_convs):
            convs.append(ConvModule(
                in_ch, self.channels, self.kernel_size,
                padding=self.kernel_size // 2, conv_cfg=self.conv_cfg,
                norm_cfg=self.norm_cfg, act_cfg=self._act_cfg()))
            ups.append(Upsample(scale_factor=self.up_scale, mode="bilinear",
                                align_corners=self.align_corners))
            in_ch = self.channels
        self.up_convs = convs
        self.upsamples = ups

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        x = self.in_norm(x)
        for conv, up in zip(self.up_convs[:-1], self.upsamples[:-1]):
            x = up(conv(x, train=train))
        x = self.up_convs[-1](x, train=train)
        if not train or self.dropout is None:
            # Classifier/upsample commute (measured -60 ms on the b16
            # 640^2 eval step, docs/PERF.md round 5): the 1x1 conv_seg is
            # linear and every bilinear row sums to 1 (so the bias
            # commutes too), hence up(cls(x)) == cls(up(x)) exactly —
            # but upsampling num_classes channels instead of
            # ``channels`` (256) makes the final 2x resize ~128x
            # cheaper.  Only Dropout2d breaks the identity, so the
            # original order is kept for train steps that use dropout.
            return self.upsamples[-1](self.cls_seg(x, train=train))
        return self.cls_seg(self.upsamples[-1](x), train=train)
