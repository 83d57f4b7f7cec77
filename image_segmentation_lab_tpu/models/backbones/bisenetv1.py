"""BiSeNetV1 backbone (Yu et al., ECCV 2018; mmseg ``BiSeNetV1``
semantics).

Beyond-reference realtime family complementing ``bisenetv2.py``: a
shallow stride-8 Spatial Path (7x7 then two strided 3x3 convs and a 1x1
expander) runs beside a Context Path wrapping a host backbone (ResNet),
whose 1/16 and 1/32 stages are gated by Attention Refinement Modules
(global-pool sigmoid channel gates) and fused top-down with
nearest-neighbor upsampling; a Feature Fusion Module joins the two
paths with a squeeze-excite-style residual gate.  Everything is
conv+BN+ReLU on the MXU — the gates are (1, 1, C) matvecs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...ops.pooling import adaptive_avg_pool2d
from ...utils.ops import resize
from ..builder import build_module_from_cfg
from ..common.conv_module import ConvModule


class SpatialPath(nn.Module):
    """mmseg ``SpatialPath``: 7x7/s2 → 3x3/s2 → 3x3/s2 → 1x1."""

    in_channels: int
    spatial_channels: Sequence[int] = (64, 64, 64, 128)
    norm_cfg: Optional[Dict] = None

    def setup(self):
        assert len(self.spatial_channels) == 4
        chs = self.spatial_channels
        kw = dict(norm_cfg=self.norm_cfg)
        self.layers = [
            ConvModule(self.in_channels, chs[0], 7, stride=2, padding=3,
                       **kw),
            ConvModule(chs[0], chs[1], 3, stride=2, padding=1, **kw),
            ConvModule(chs[1], chs[2], 3, stride=2, padding=1, **kw),
            ConvModule(chs[2], chs[3], 1, **kw),
        ]

    def __call__(self, x, train: bool = False):
        for layer in self.layers:
            x = layer(x, train=train)
        return x


class AttentionRefinementModule(nn.Module):
    """3x3 conv + global-pool → 1x1 conv+BN → sigmoid channel gate."""

    in_channels: int
    out_channel: int
    norm_cfg: Optional[Dict] = None

    def setup(self):
        self.conv_layer = ConvModule(self.in_channels, self.out_channel, 3,
                                     padding=1, norm_cfg=self.norm_cfg)
        self.atten_conv = ConvModule(self.out_channel, self.out_channel, 1,
                                     norm_cfg=self.norm_cfg, act_cfg=None,
                                     bias=False)

    def __call__(self, x, train: bool = False):
        x = self.conv_layer(x, train=train)
        atten = self.atten_conv(adaptive_avg_pool2d(x, 1), train=train)
        return x * nn.sigmoid(atten)


class ContextPath(nn.Module):
    """Host backbone + ARM16/ARM32 + top-down nearest fusion."""

    backbone_cfg: Dict
    context_channels: Sequence[int] = (128, 256, 512)
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None

    def setup(self):
        assert len(self.context_channels) == 3
        cc = self.context_channels
        self.backbone = build_module_from_cfg(dict(self.backbone_cfg),
                                              BACKBONE)
        self.arm16 = AttentionRefinementModule(cc[1], cc[0],
                                               norm_cfg=self.norm_cfg)
        self.arm32 = AttentionRefinementModule(cc[2], cc[0],
                                               norm_cfg=self.norm_cfg)
        self.conv_head32 = ConvModule(cc[0], cc[0], 3, padding=1,
                                      norm_cfg=self.norm_cfg)
        self.conv_head16 = ConvModule(cc[0], cc[0], 3, padding=1,
                                      norm_cfg=self.norm_cfg)
        self.gap_conv = ConvModule(cc[2], cc[0], 1, norm_cfg=self.norm_cfg)

    def __call__(self, x, train: bool = False):
        x_4, x_8, x_16, x_32 = self.backbone(x, train=train)
        x_gap = self.gap_conv(adaptive_avg_pool2d(x_32, 1), train=train)
        x_32_sum = self.arm32(x_32, train=train) + x_gap
        x_32_up = resize(x_32_sum, size=x_16.shape[1:3], mode="nearest")
        x_32_up = self.conv_head32(x_32_up, train=train)
        x_16_sum = self.arm16(x_16, train=train) + x_32_up
        x_16_up = resize(x_16_sum, size=x_8.shape[1:3], mode="nearest")
        x_16_up = self.conv_head16(x_16_up, train=train)
        return x_16_up, x_32_up


class FeatureFusionModule(nn.Module):
    """Concat → 1x1 conv → SE-style sigmoid residual gate (mmseg FFM)."""

    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    def setup(self):
        self.conv1 = ConvModule(self.in_channels, self.out_channels, 1,
                                norm_cfg=self.norm_cfg)
        self.conv_atten = ConvModule(self.out_channels, self.out_channels,
                                     1, norm_cfg=self.norm_cfg)

    def __call__(self, x_sp, x_cp, train: bool = False):
        fuse = self.conv1(jnp.concatenate([x_sp, x_cp], axis=-1),
                          train=train)
        atten = nn.sigmoid(self.conv_atten(adaptive_avg_pool2d(fuse, 1),
                                           train=train))
        return fuse * atten + fuse


@BACKBONE.register()
class BiSeNetV1(nn.Module):
    """mmseg ``BiSeNetV1``: outs = (ffm, context8, context16)[out_indices].

    The default ResNet-18 context path matches mmseg's
    bisenetv1_r18-d32 configuration.
    """

    backbone_cfg: Optional[Dict] = None
    in_channels: int = 3
    spatial_channels: Sequence[int] = (64, 64, 64, 128)
    context_channels: Sequence[int] = (128, 256, 512)
    out_indices: Sequence[int] = (0, 1, 2)
    out_channels: int = 256
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        assert self.backbone_cfg is not None, "BiSeNetV1 needs backbone_cfg"
        assert len(self.spatial_channels) == 4
        assert len(self.context_channels) == 3
        self.context_path = ContextPath(self.backbone_cfg,
                                        self.context_channels,
                                        self.align_corners,
                                        norm_cfg=self.norm_cfg)
        self.spatial_path = SpatialPath(self.in_channels,
                                        self.spatial_channels,
                                        norm_cfg=self.norm_cfg)
        self.ffm = FeatureFusionModule(self.context_channels[1],
                                       self.out_channels,
                                       norm_cfg=self.norm_cfg)

    def __call__(self, x, train: bool = False):
        x_context8, x_context16 = self.context_path(x, train=train)
        x_spatial = self.spatial_path(x, train=train)
        x_fuse = self.ffm(x_spatial, x_context8, train=train)
        outs = (x_fuse, x_context8, x_context16)
        return tuple(outs[i] for i in self.out_indices)
