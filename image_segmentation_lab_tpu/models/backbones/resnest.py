"""ResNeSt backbone (Zhang et al., 2020; mmseg ``ResNeSt`` semantics).

Beyond-reference family.  The bottleneck's 3x3 conv becomes a
Split-Attention conv: a grouped conv produces ``radix`` feature splits,
a squeeze-excite-style gate (global pool → grouped fc1 → grouped fc2 →
radix-softmax) weights the splits, and the weighted sum replaces the
plain conv output.  NHWC/TPU notes: the radix splits are a static
reshape of the lane axis (r-major, matching torch's channel-major
``view``); the rSoftmax's (groups, radix) transpose happens on a
(N, 1, 1, C) gate vector so it never touches the feature map; strided
blocks use mmseg's ``avg_down_stride`` (3x3 avg-pool after the unit-
stride SplAt conv).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_
from ...core.registry_hub import BACKBONE
from ...ops.pooling import adaptive_avg_pool2d, avg_pool2d
from ..builder import build_conv_layer, build_norm_layer
from .resnet import _KAIMING, ResNetV1d, _norm_cfg


def rsoftmax(atten: jnp.ndarray, radix: int, groups: int) -> jnp.ndarray:
    """mmseg ``RSoftmax``: softmax over radix within each group.

    ``atten`` is (N, 1, 1, C*radix) in g-major layout (fc2's grouped
    output); returns (N, radix, C) in the r-major layout the feature
    splits use.
    """
    N = atten.shape[0]
    if radix > 1:
        a = atten.reshape(N, groups, radix, -1).astype(jnp.float32)
        a = nn.softmax(a, axis=2)
        return a.transpose(0, 2, 1, 3).reshape(N, radix, -1)
    return nn.sigmoid(atten).reshape(N, 1, -1)


class SplitAttentionConv2d(nn.Module):
    """mmseg ``SplitAttentionConv2d`` (norm + ReLU fused in, as upstream)."""

    in_channels: int
    channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    trainable: bool = True
    norm_force_eval: bool = False

    def setup(self):
        inter = max(self.in_channels * self.radix //
                    self.reduction_factor, 32)
        ncfg = _norm_cfg(self.norm_cfg, self.trainable, self.norm_force_eval)
        self.conv = build_conv_layer(
            self.conv_cfg, self.in_channels, self.channels * self.radix,
            self.kernel_size, stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups * self.radix,
            bias=False, trainable=self.trainable, weight_init=_KAIMING)
        self.norm0 = build_norm_layer(ncfg, self.channels * self.radix,
                                      postfix=0)[1]
        self.fc1 = build_conv_layer(
            None, self.channels, inter, 1, groups=self.groups,
            trainable=self.trainable, weight_init=_KAIMING)
        self.norm1 = build_norm_layer(ncfg, inter, postfix=1)[1]
        self.fc2 = build_conv_layer(
            None, inter, self.channels * self.radix, 1, groups=self.groups,
            trainable=self.trainable, weight_init=_KAIMING)

    def __call__(self, x, train: bool = False):
        x = nn.relu(self.norm0(self.conv(x, train=train), train=train))
        N, H, W, _ = x.shape
        if self.radix > 1:
            splits = x.reshape(N, H, W, self.radix, self.channels)
            gap = splits.sum(axis=3)
        else:
            gap = x
        gap = adaptive_avg_pool2d(gap, 1)
        gap = nn.relu(self.norm1(self.fc1(gap, train=train), train=train))
        atten = self.fc2(gap, train=train)
        a = rsoftmax(atten, self.radix, self.groups).astype(x.dtype)
        if self.radix > 1:
            return jnp.einsum("nhwrc,nrc->nhwc", splits, a)
        return x * a.reshape(N, 1, 1, self.channels)


class SplAtBottleneck(nn.Module):
    """mmseg ResNeSt ``Bottleneck``: conv2 → SplAt conv (+ avd pooling)."""

    expansion = 4

    inplanes: int
    planes: int
    stride: int = 1
    dilation: int = 1
    avg_down: bool = False
    style: str = "pytorch"
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    plugins: Optional[list] = None
    trainable: bool = True
    norm_force_eval: bool = False
    zero_init_residual: bool = False
    groups: int = 1
    base_width: int = 4
    base_channels: int = 64
    radix: int = 2
    reduction_factor: int = 4
    avg_down_stride: bool = True

    def setup(self):
        assert self.plugins is None, "plugins not supported in SplAtBottleneck"
        ncfg = _norm_cfg(self.norm_cfg, self.trainable, self.norm_force_eval)
        conv1_stride = 1 if self.style == "pytorch" else self.stride
        conv2_stride = self.stride if self.style == "pytorch" else 1
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes *
                        (self.base_width / self.base_channels)) * self.groups
        self.width = width
        self.with_avd = self.avg_down_stride and conv2_stride > 1
        self.conv2_stride = conv2_stride

        self.conv1 = build_conv_layer(
            self.conv_cfg, self.inplanes, width, 1, stride=conv1_stride,
            bias=False, trainable=self.trainable, weight_init=_KAIMING)
        self.bn1 = build_norm_layer(ncfg, width, postfix=1)[1]
        self.conv2 = SplitAttentionConv2d(
            width, width, 3, stride=1 if self.with_avd else conv2_stride,
            padding=self.dilation, dilation=self.dilation,
            groups=self.groups, radix=self.radix,
            reduction_factor=self.reduction_factor, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, trainable=self.trainable,
            norm_force_eval=self.norm_force_eval)
        self.conv3 = build_conv_layer(
            self.conv_cfg, width, self.planes * self.expansion, 1,
            bias=False, trainable=self.trainable, weight_init=_KAIMING)
        ncfg3 = dict(ncfg)
        if self.zero_init_residual:
            ncfg3["weight_init"] = constant_(0.0)
        self.bn3 = build_norm_layer(ncfg3, self.planes * self.expansion,
                                    postfix=3)[1]

        self.has_downsample = (
            self.stride != 1
            or self.inplanes != self.planes * self.expansion)
        if self.has_downsample:
            conv_stride = 1 if (self.avg_down and self.stride != 1) \
                else self.stride
            self.downsample_conv = build_conv_layer(
                self.conv_cfg, self.inplanes, self.planes * self.expansion,
                1, stride=conv_stride, bias=False, trainable=self.trainable,
                weight_init=_KAIMING)
            self.downsample_bn = build_norm_layer(
                ncfg, self.planes * self.expansion)[1]

    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.relu(self.bn1(self.conv1(x, train=train), train=train))
        out = self.conv2(out, train=train)
        if self.with_avd:
            out = avg_pool2d(out, 3, self.conv2_stride, padding=1)
        out = self.bn3(self.conv3(out, train=train), train=train)
        if self.has_downsample:
            if self.avg_down and self.stride != 1:
                identity = avg_pool2d(identity, self.stride, self.stride,
                                      ceil_mode=True,
                                      count_include_pad=False)
            identity = self.downsample_bn(
                self.downsample_conv(identity, train=train), train=train)
        return nn.relu(out + identity)


@BACKBONE.register()
class ResNeSt(ResNetV1d):
    """mmseg ``ResNeSt``: V1d ResNet with split-attention bottlenecks."""

    arch_settings = {
        50: (SplAtBottleneck, (3, 4, 6, 3)),
        101: (SplAtBottleneck, (3, 4, 23, 3)),
        152: (SplAtBottleneck, (3, 8, 36, 3)),
        200: (SplAtBottleneck, (3, 24, 36, 3)),
    }

    groups: int = 1
    base_width: int = 4
    radix: int = 2
    reduction_factor: int = 4
    avg_down_stride: bool = True

    def _extra_block_kwargs(self):
        return dict(groups=self.groups, base_width=self.base_width,
                    base_channels=self.base_channels, radix=self.radix,
                    reduction_factor=self.reduction_factor,
                    avg_down_stride=self.avg_down_stride)
