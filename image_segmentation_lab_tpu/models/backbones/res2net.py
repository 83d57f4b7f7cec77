"""Res2Net backbone (Gao et al., TPAMI 2021; mmseg ``Res2Net`` semantics).

Beyond-reference family.  The Bottle2neck replaces the bottleneck's
single 3x3 conv with a multi-scale hierarchy: the 1x1-expanded features
split into ``scales`` width-``w`` groups; each group (except the last)
passes a 3x3 conv whose input accumulates the previous group's output
('normal' blocks), giving receptive fields that grow per group.  On TPU
the splits are static lane-axis slices and the scale convs stay dense
MXU 3x3s; the stage-entry block ('stage' type) skips the accumulation
and average-pools the pass-through group when it strides.

Defaults follow mmseg: ``scales=4, base_width=26``, V1d-style deep stem
and avg-down shortcuts (the avg-pool + 1x1 shortcut mmseg's Res2Layer
builds explicitly is exactly the ``avg_down=True`` Bottleneck shortcut).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_
from ...core.registry_hub import BACKBONE
from ...ops.pooling import avg_pool2d
from ..builder import build_conv_layer, build_norm_layer
from .resnet import _KAIMING, ResNet, _norm_cfg


class Bottle2neck(nn.Module):
    """mmseg ``Bottle2neck`` (res2net.py): multi-scale bottleneck."""

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
    scales: int = 4
    base_width: int = 26
    base_channels: int = 64

    def setup(self):
        assert self.scales > 1, "Bottle2neck needs scales > 1"
        assert self.plugins is None, "plugins not supported in Bottle2neck"
        ncfg = _norm_cfg(self.norm_cfg, self.trainable, self.norm_force_eval)
        conv1_stride = 1 if self.style == "pytorch" else self.stride
        conv2_stride = self.stride if self.style == "pytorch" else 1
        width = int(self.planes * (self.base_width / self.base_channels))
        self.width = width
        self.conv2_stride = conv2_stride

        self.conv1 = build_conv_layer(
            self.conv_cfg, self.inplanes, width * self.scales, 1,
            stride=conv1_stride, bias=False, trainable=self.trainable,
            weight_init=_KAIMING)
        self.bn1 = build_norm_layer(ncfg, width * self.scales, postfix=1)[1]
        self.convs = [
            build_conv_layer(self.conv_cfg, width, width, 3,
                             stride=conv2_stride, padding=self.dilation,
                             dilation=self.dilation, bias=False,
                             trainable=self.trainable, weight_init=_KAIMING)
            for _ in range(self.scales - 1)
        ]
        self.bns = [build_norm_layer(ncfg, width, postfix=i + 1)[1]
                    for i in range(self.scales - 1)]
        self.conv3 = build_conv_layer(
            self.conv_cfg, width * self.scales,
            self.planes * self.expansion, 1, bias=False,
            trainable=self.trainable, weight_init=_KAIMING)
        ncfg3 = dict(ncfg)
        if self.zero_init_residual:
            ncfg3["weight_init"] = constant_(0.0)
        self.bn3 = build_norm_layer(ncfg3, self.planes * self.expansion,
                                    postfix=3)[1]

        # mmseg's Res2Layer marks the layer-entry block 'stage'; that is
        # exactly the block that owns a downsample branch.
        self.has_downsample = (
            self.stride != 1
            or self.inplanes != self.planes * self.expansion)
        self.stage_type = "stage" if self.has_downsample else "normal"
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

        w, s = self.width, self.scales
        spx = [out[..., i * w:(i + 1) * w] for i in range(s)]
        sp = nn.relu(self.bns[0](self.convs[0](spx[0], train=train),
                                 train=train))
        outs = [sp]
        for i in range(1, s - 1):
            sp = spx[i] if self.stage_type == "stage" else sp + spx[i]
            sp = nn.relu(self.bns[i](self.convs[i](sp, train=train),
                                     train=train))
            outs.append(sp)
        if self.stage_type == "normal" or self.conv2_stride == 1:
            outs.append(spx[s - 1])
        else:  # strided stage entry: pool the pass-through split
            outs.append(avg_pool2d(spx[s - 1], 3, self.conv2_stride,
                                   padding=1))
        out = jnp.concatenate(outs, axis=-1)

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
class Res2Net(ResNet):
    """mmseg ``Res2Net``: ResNet with Bottle2neck blocks, V1d stem."""

    arch_settings = {
        50: (Bottle2neck, (3, 4, 6, 3)),
        101: (Bottle2neck, (3, 4, 23, 3)),
        152: (Bottle2neck, (3, 8, 36, 3)),
    }

    scales: int = 4
    base_width: int = 26
    deep_stem: bool = True
    avg_down: bool = True

    def _extra_block_kwargs(self):
        return dict(scales=self.scales, base_width=self.base_width,
                    base_channels=self.base_channels)
