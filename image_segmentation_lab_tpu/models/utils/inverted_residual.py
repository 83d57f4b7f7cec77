"""Inverted residual blocks (reference ``models/utils/inverted_residual.py``).

``InvertedResidual`` (MobileNetV2, :22-112): expand 1x1 → depthwise 3x3
(groups=hidden) → linear 1x1, residual iff stride==1 and in==out.
``InvertedResidualV3`` (MobileNetV3, :115-226): optional expand conv,
depthwise with Conv2dAdaptivePadding when stride==2, optional SE, linear
conv.  ``with_cp`` maps to ``nn.remat``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from flax import linen as nn

from ..common.conv_module import ConvModule
from .se_layer import SELayer

_DEF = object()


class InvertedResidual(nn.Module):
    in_channels: int = None
    out_channels: int = None
    stride: int = 1
    expand_ratio: int = 1
    dilation: int = 1
    conv_cfg: Optional[Dict] = None
    norm_cfg: Any = _DEF
    act_cfg: Any = _DEF
    with_cp: bool = False
    trainable: bool = True

    def setup(self):
        assert self.stride in (1, 2), f"stride must in [1, 2], " \
                                      f"got {self.stride}"
        norm_cfg = dict(type="BN") if self.norm_cfg is _DEF else self.norm_cfg
        act_cfg = dict(type="ReLU6") if self.act_cfg is _DEF else self.act_cfg
        self.use_res_connect = (self.stride == 1
                                and self.in_channels == self.out_channels)
        hidden_dim = int(round(self.in_channels * self.expand_ratio))
        layers = []
        if self.expand_ratio != 1:
            layers.append(ConvModule(self.in_channels, hidden_dim, 1,
                                     conv_cfg=self.conv_cfg,
                                     norm_cfg=norm_cfg, act_cfg=act_cfg,
                                     trainable=self.trainable))
        layers.append(ConvModule(hidden_dim, hidden_dim, 3,
                                 stride=self.stride, padding=self.dilation,
                                 dilation=self.dilation, groups=hidden_dim,
                                 conv_cfg=self.conv_cfg, norm_cfg=norm_cfg,
                                 act_cfg=act_cfg, trainable=self.trainable))
        layers.append(ConvModule(hidden_dim, self.out_channels, 1,
                                 conv_cfg=self.conv_cfg, norm_cfg=norm_cfg,
                                 act_cfg=None, trainable=self.trainable))
        self.conv = layers

    def __call__(self, x, train: bool = False):
        def inner(mdl, x):
            out = x
            for layer in mdl.conv:
                out = layer(out, train=train)
            return x + out if mdl.use_res_connect else out

        if self.with_cp:
            return nn.remat(inner)(self, x)
        return inner(self, x)


class InvertedResidualV3(nn.Module):
    in_channels: int = None
    out_channels: int = None
    mid_channels: int = None
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    se_cfg: Optional[Dict] = None
    with_expand_conv: bool = True
    conv_cfg: Optional[Dict] = None
    norm_cfg: Any = _DEF
    act_cfg: Any = _DEF
    with_cp: bool = False
    trainable: bool = True
    # declarative replacement of the reference's post-build conv surgery
    # (mobilenet_v3.py:209-251): force adaptive padding even at stride 1
    force_adaptive_padding: bool = False

    def setup(self):
        norm_cfg = dict(type="BN") if self.norm_cfg is _DEF else self.norm_cfg
        act_cfg = dict(type="ReLU") if self.act_cfg is _DEF else self.act_cfg
        self.with_res_shortcut = (self.stride == 1
                                  and self.in_channels == self.out_channels)
        self.with_se = self.se_cfg is not None
        if not self.with_expand_conv:
            assert self.mid_channels == self.in_channels

        if self.with_expand_conv:
            self.expand_conv = ConvModule(
                self.in_channels, self.mid_channels, 1,
                conv_cfg=self.conv_cfg, norm_cfg=norm_cfg, act_cfg=act_cfg,
                trainable=self.trainable)
        use_adaptive = self.stride == 2 or self.force_adaptive_padding
        dw_conv_cfg = (dict(type="Conv2dAdaptivePadding") if use_adaptive
                       else self.conv_cfg)
        self.depthwise_conv = ConvModule(
            self.mid_channels, self.mid_channels, self.kernel_size,
            stride=self.stride,
            padding=(self.kernel_size // 2) * self.dilation,
            dilation=self.dilation, groups=self.mid_channels,
            conv_cfg=dw_conv_cfg, norm_cfg=norm_cfg, act_cfg=act_cfg,
            trainable=self.trainable)
        if self.with_se:
            self.se = SELayer(**dict(self.se_cfg), trainable=self.trainable)
        self.linear_conv = ConvModule(
            self.mid_channels, self.out_channels, 1, conv_cfg=self.conv_cfg,
            norm_cfg=norm_cfg, act_cfg=None, trainable=self.trainable)

    def __call__(self, x, train: bool = False):
        def inner(mdl, x):
            out = x
            if mdl.with_expand_conv:
                out = mdl.expand_conv(out, train=train)
            out = mdl.depthwise_conv(out, train=train)
            if mdl.with_se:
                out = mdl.se(out, train=train)
            out = mdl.linear_conv(out, train=train)
            return x + out if mdl.with_res_shortcut else out

        if self.with_cp:
            return nn.remat(inner)(self, x)
        return inner(self, x)
