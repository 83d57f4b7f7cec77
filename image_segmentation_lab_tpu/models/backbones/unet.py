"""UNet backbone.

Not present in the reference zoo, but the driver's benchmark configs name it
(BASELINE.json configs 1-2: "UNet whole-image inference / training step"),
so it is part of this framework's surface.  Standard symmetric UNet
(arXiv:1505.04597, mmseg-style parameterization): ``num_stages`` encoder
levels of double ConvModules with 2× max-pool downsampling, and a decoder
that bilinearly upsamples, concatenates the skip, and double-convs back up.
Returns the decoder features coarsest→finest (the finest is ``in_index=-1``
for an FCNHead).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...ops.pooling import max_pool2d
from ...utils.ops import resize
from ..common.conv_module import ConvModule

_DEF = object()


class _DoubleConv(nn.Module):
    in_channels: int
    out_channels: int
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    def setup(self):
        self.convs = [
            ConvModule(self.in_channels, self.out_channels, 3, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg),
            ConvModule(self.out_channels, self.out_channels, 3, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg),
        ]

    def __call__(self, x, train: bool = False):
        for conv in self.convs:
            x = conv(x, train=train)
        return x


@BACKBONE.register()
class UNet(nn.Module):
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 5
    conv_cfg: Optional[Dict] = None
    norm_cfg: Any = _DEF
    act_cfg: Any = _DEF
    align_corners: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        norm_cfg = (dict(type="BN", requires_grad=True)
                    if self.norm_cfg is _DEF else self.norm_cfg)
        act_cfg = dict(type="ReLU") if self.act_cfg is _DEF else self.act_cfg
        enc, dec = [], []
        ch_in = self.in_channels
        channels = [self.base_channels * 2 ** i
                    for i in range(self.num_stages)]
        for c in channels:
            enc.append(_DoubleConv(ch_in, c, self.conv_cfg, norm_cfg,
                                   act_cfg))
            ch_in = c
        for i in range(self.num_stages - 2, -1, -1):
            # upsampled deep feature concat skip → stage channels
            dec.append(_DoubleConv(channels[i + 1] + channels[i],
                                   channels[i], self.conv_cfg, norm_cfg,
                                   act_cfg))
        self.encoders = enc
        self.decoders = dec

    def __call__(self, x, train: bool = False):
        skips = []
        for i, enc in enumerate(self.encoders):
            if i > 0:
                x = max_pool2d(x, 2, stride=2)
            x = enc(x, train=train)
            skips.append(x)
        outs = [x]
        for d, dec in enumerate(self.decoders):
            skip = skips[self.num_stages - 2 - d]
            x = resize(x, size=skip.shape[1:3], mode="bilinear",
                       align_corners=self.align_corners)
            x = dec(jnp.concatenate([x, skip], axis=-1), train=train)
            outs.append(x)
        return tuple(outs)
