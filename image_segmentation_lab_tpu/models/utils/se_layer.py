"""Squeeze-and-Excitation layer (reference ``models/utils/se_layer.py``).

Global average pool → 1x1 conv (act[0]) → 1x1 conv (act[1]) → channel scale
(:75-80); squeeze channels via ``make_divisible(channels/ratio, divisor)``
(:54-55).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from flax import linen as nn

from ...ops.pooling import adaptive_avg_pool2d
from ...utils.math_utils import make_divisible
from ..common.conv_module import ConvModule

_DEF_ACTS = object()


class SELayer(nn.Module):
    channels: int = None
    squeeze_channels: Optional[int] = None
    ratio: int = 16
    divisor: int = 8
    conv_cfg: Optional[Dict] = None
    act_cfg: Any = _DEF_ACTS
    trainable: bool = True

    def setup(self):
        act_cfg = (self.act_cfg if self.act_cfg is not _DEF_ACTS
                   else (dict(type="ReLU"), dict(type="Sigmoid")))
        if isinstance(act_cfg, dict):
            act_cfg = (act_cfg, act_cfg)
        assert len(act_cfg) == 2
        squeeze = self.squeeze_channels
        if squeeze is None:
            squeeze = make_divisible(self.channels // self.ratio,
                                     self.divisor)
        assert isinstance(squeeze, int) and squeeze > 0
        self.conv1 = ConvModule(self.channels, squeeze, 1,
                                conv_cfg=self.conv_cfg, act_cfg=act_cfg[0],
                                trainable=self.trainable)
        self.conv2 = ConvModule(squeeze, self.channels, 1,
                                conv_cfg=self.conv_cfg, act_cfg=act_cfg[1],
                                trainable=self.trainable)

    def __call__(self, x, train: bool = False):
        out = adaptive_avg_pool2d(x, 1)
        out = self.conv1(out, train=train)
        out = self.conv2(out, train=train)
        return x * out
