"""JPU neck (Wu et al., 2019 — "FastFCN: Rethinking Dilated Convolution
in the Backbone for Semantic Segmentation"; mmseg ``JPU``).

Beyond-reference addition.  Joint Pyramid Upsampling replaces a dilated
backbone: the backbone runs at its natural strides (cheap), and the JPU
reconstructs a high-resolution dilated-equivalent feature by (a)
3x3-projecting each tapped level, (b) upsampling everything to the
finest tapped resolution, (c) running depthwise-separable 3x3 convs at
several dilations over the concat, and (d) concatenating the dilation
branches.  On TPU this trades the dilated trunk's big-feature convs for
a short burst of separable convs at 1/8 — the same reason the slab
decomposition won on ASPP (docs/PERF.md): FLOPs move from stride-8
ResNet stages onto cheap depthwise + 1x1 work.

Forward contract (upstream jpu.py, as consumed by the fastfcn configs —
decode head ``in_index=2`` fused / aux ``in_index=1`` raw): levels
``start_level..end_level`` feed the fusion; the output tuple keeps every
input level except the last and appends the fused map
(``len(dilations) * mid_channels`` wide) as the new last element.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import NECK
from ...utils.ops import resize
from ..common.conv_module import ConvModule
from ..utils.depthwise_separable_conv_module import \
    DepthwiseSeparableConvModule


@NECK.register()
class JPU(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    mid_channels: int = 512
    start_level: int = 0
    end_level: int = -1
    dilations: Sequence[int] = (1, 2, 4, 8)
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None

    def setup(self):
        assert isinstance(self.in_channels, (list, tuple))
        end = (len(self.in_channels) if self.end_level == -1
               else self.end_level + 1)
        assert 0 <= self.start_level < end <= len(self.in_channels)
        self._end = end
        ncfg = dict(self.norm_cfg or dict(type="BN", requires_grad=True))
        mid = self.mid_channels
        self.conv_layers = [
            ConvModule(self.in_channels[i], mid, 3, padding=1,
                       norm_cfg=dict(ncfg), act_cfg=dict(type="ReLU"),
                       name=f"conv{i}")
            for i in range(self.start_level, end)
        ]
        n_levels = end - self.start_level
        self.dilation_layers = [
            DepthwiseSeparableConvModule(
                mid * n_levels, mid, 3, padding=d, dilation=d,
                norm_cfg=dict(ncfg), act_cfg=dict(type="ReLU"),
                dw_act_cfg=None, name=f"dilation{d}")
            for d in self.dilations
        ]

    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        feats = [conv(inputs[self.start_level + i], train=train)
                 for i, conv in enumerate(self.conv_layers)]
        size = feats[0].shape[1:3]
        feats = [feats[0]] + [
            resize(f, size=size, mode="bilinear",
                   align_corners=self.align_corners) for f in feats[1:]
        ]
        feat = jnp.concatenate(feats, axis=-1)
        out = jnp.concatenate(
            [layer(feat, train=train) for layer in self.dilation_layers],
            axis=-1)
        return tuple(inputs[:-1]) + (out,)
