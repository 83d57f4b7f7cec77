"""Depthwise-separable ConvModule.

Parity target: reference ``models/utils/depthwise_separable_conv_module.py``
(:17-106): a depthwise ConvModule (groups == in_channels) followed by a
pointwise 1x1 ConvModule, each with independently overridable norm/act cfgs
(``dw_norm_cfg``/``dw_act_cfg``/``pw_norm_cfg``/``pw_act_cfg``, 'default' →
inherit).  On TPU the depthwise conv runs on the VPU and the pointwise 1x1 on
the MXU; XLA fuses norm+act into each.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Union

from flax import linen as nn

from ..common.conv_module import ConvModule

_DEFAULT_ACT = object()


class DepthwiseSeparableConvModule(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int], str] = 0
    dilation: Union[int, Sequence[int]] = 1
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = _DEFAULT_ACT
    dw_norm_cfg: Any = "default"
    dw_act_cfg: Any = "default"
    pw_norm_cfg: Any = "default"
    pw_act_cfg: Any = "default"
    trainable: bool = True

    def setup(self):
        act_cfg = {"type": "ReLU"} if self.act_cfg is _DEFAULT_ACT else self.act_cfg
        dw_norm = self.norm_cfg if self.dw_norm_cfg == "default" else self.dw_norm_cfg
        dw_act = act_cfg if self.dw_act_cfg == "default" else self.dw_act_cfg
        pw_norm = self.norm_cfg if self.pw_norm_cfg == "default" else self.pw_norm_cfg
        pw_act = act_cfg if self.pw_act_cfg == "default" else self.pw_act_cfg

        self.depthwise_conv = ConvModule(
            self.in_channels, self.in_channels, self.kernel_size,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            groups=self.in_channels, norm_cfg=dw_norm, act_cfg=dw_act,
            trainable=self.trainable)
        self.pointwise_conv = ConvModule(
            self.in_channels, self.out_channels, 1, norm_cfg=pw_norm,
            act_cfg=pw_act, trainable=self.trainable)

    def __call__(self, x, train: bool = False):
        x = self.depthwise_conv(x, train=train)
        return self.pointwise_conv(x, train=train)
