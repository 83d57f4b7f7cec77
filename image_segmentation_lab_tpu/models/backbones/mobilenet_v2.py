"""MobileNetV2 backbone (reference ``models/backbones/mobilenet_v2.py``).

arch_settings of 7 inverted-residual stages (:61-62), ``widen_factor`` +
``make_divisible`` channel rounding (:119, :137), per-stage stride/dilation
for segmentation variants (:66-67), default ``out_indices=(1, 2, 4, 6)``.
Depthwise convs run on the VPU, pointwise 1x1s on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...utils.math_utils import make_divisible
from ..common.conv_module import ConvModule
from ..utils.inverted_residual import InvertedResidual

_DEF = object()


@BACKBONE.register()
class MobileNetV2(nn.Module):
    # [expand_ratio, channel, num_blocks] per stage
    arch_settings = [[1, 16, 1], [6, 24, 2], [6, 32, 3], [6, 64, 4],
                     [6, 96, 3], [6, 160, 3], [6, 320, 1]]

    widen_factor: float = 1.0
    strides: Sequence[int] = (1, 2, 2, 2, 1, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 1, 1)
    out_indices: Sequence[int] = (1, 2, 4, 6)
    frozen_stages: int = -1
    conv_cfg: Optional[Dict] = None
    norm_cfg: Any = _DEF
    act_cfg: Any = _DEF
    norm_eval: bool = False
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        norm_cfg = dict(type="BN") if self.norm_cfg is _DEF else self.norm_cfg
        act_cfg = (dict(type="ReLU6") if self.act_cfg is _DEF
                   else self.act_cfg)
        assert len(self.strides) == len(self.dilations) == len(
            self.arch_settings)
        for index in self.out_indices:
            if index not in range(0, 7):
                raise ValueError("the item in out_indices must in "
                                 f"range(0, 7). But received {index}")
        if self.frozen_stages not in range(-1, 7):
            raise ValueError("frozen_stages must be in range(-1, 7). "
                             f"But received {self.frozen_stages}")

        from .resnet import _norm_cfg as stage_norm  # shared freeze logic

        stem_trainable = self.frozen_stages < 0
        in_channels = make_divisible(32 * self.widen_factor, 8)
        self.conv1 = ConvModule(
            3, in_channels, 3, stride=2, padding=1, conv_cfg=self.conv_cfg,
            norm_cfg=stage_norm(norm_cfg, stem_trainable,
                                self.norm_eval or not stem_trainable),
            act_cfg=act_cfg, trainable=stem_trainable)

        stages = []
        for i, (expand_ratio, channel, num_blocks) in enumerate(
                self.arch_settings):
            trainable = i + 1 > self.frozen_stages
            ncfg = stage_norm(norm_cfg, trainable,
                              self.norm_eval or not trainable)
            out_channels = make_divisible(channel * self.widen_factor, 8)
            blocks = []
            for j in range(num_blocks):
                blocks.append(InvertedResidual(
                    in_channels, out_channels,
                    stride=self.strides[i] if j == 0 else 1,
                    expand_ratio=expand_ratio,
                    dilation=self.dilations[i] if j == 0 else 1,
                    conv_cfg=self.conv_cfg, norm_cfg=ncfg, act_cfg=act_cfg,
                    with_cp=self.with_cp, trainable=trainable))
                in_channels = out_channels
            stages.append(blocks)
        self.stages = stages

    def __call__(self, x, train: bool = False):
        x = self.conv1(x, train=train)
        outs = []
        for i, blocks in enumerate(self.stages):
            for block in blocks:
                x = block(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
