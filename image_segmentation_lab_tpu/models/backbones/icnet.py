"""ICNet backbone (reference ``models/backbones/icnet.py``).

Three-resolution cascade: ``conv_sub1`` = three stride-2 3x3 ConvModules on
the full-res image (:105-129); ``sub2`` = inner-backbone stem + layer1-2 on
the 0.5× image (:153-162); ``sub4`` = layer3-4 + PPM + bottleneck on the
0.25× path (:165-176); returns the three branch features.  The inner
backbone runs with a ceil-mode stem maxpool (declarative flag instead of the
reference's post-build mutation, :83-85).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...utils.ops import resize
from ..builder import build_module_from_cfg
from ..common.conv_module import ConvModule
from ..decode_heads.psp_head import PPM

_DEF = object()


@BACKBONE.register()
class ICNet(nn.Module):
    backbone_cfg: Dict = None
    in_channels: int = 3
    layer_channels: Sequence[int] = (512, 2048)
    light_branch_middle_channels: int = 32
    psp_out_channels: int = 512
    out_channels: Sequence[int] = (64, 256, 256)
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    conv_cfg: Optional[Dict] = None
    norm_cfg: Any = _DEF
    act_cfg: Any = _DEF
    align_corners: bool = False
    init_cfg: Optional[Any] = None

    def setup(self):
        if self.backbone_cfg is None:
            raise TypeError("backbone_cfg must be passed from config file!")
        norm_cfg = (dict(type="BN", requires_grad=True)
                    if self.norm_cfg is _DEF else self.norm_cfg)
        act_cfg = dict(type="ReLU") if self.act_cfg is _DEF else self.act_cfg
        bcfg = dict(self.backbone_cfg)
        bcfg.setdefault("maxpool_ceil_mode", True)
        self.backbone = build_module_from_cfg(bcfg, BACKBONE,
                                              dict(name="backbone"))

        self.psp_modules = PPM(
            pool_scales=tuple(self.pool_scales),
            in_channels=self.layer_channels[1],
            channels=self.psp_out_channels,
            conv_cfg=self.conv_cfg, norm_cfg=norm_cfg, act_cfg=act_cfg,
            align_corners=self.align_corners)
        self.psp_bottleneck = ConvModule(
            self.layer_channels[1] + len(self.pool_scales) *
            self.psp_out_channels,
            self.psp_out_channels, 3, padding=1, conv_cfg=self.conv_cfg,
            norm_cfg=norm_cfg, act_cfg=act_cfg)

        mid = self.light_branch_middle_channels
        self.conv_sub1 = [
            ConvModule(self.in_channels, mid, 3, stride=2, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=norm_cfg),
            ConvModule(mid, mid, 3, stride=2, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=norm_cfg),
            ConvModule(mid, self.out_channels[0], 3, stride=2, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=norm_cfg),
        ]
        self.conv_sub2 = ConvModule(self.layer_channels[0],
                                    self.out_channels[1], 1,
                                    conv_cfg=self.conv_cfg,
                                    norm_cfg=norm_cfg)
        self.conv_sub4 = ConvModule(self.psp_out_channels,
                                    self.out_channels[2], 1,
                                    conv_cfg=self.conv_cfg,
                                    norm_cfg=norm_cfg)

    def __call__(self, x, train: bool = False):
        output = []
        # sub 1: light full-resolution branch
        s1 = x
        for conv in self.conv_sub1:
            s1 = conv(s1, train=train)
        output.append(s1)

        # sub 2: 0.5x through stem + layer1-2
        x = resize(x, scale_factor=0.5, mode="bilinear",
                   align_corners=self.align_corners)
        x = self.backbone.forward_stem(x, train=train)
        x = self.backbone.forward_layer(0, x, train=train)
        x = self.backbone.forward_layer(1, x, train=train)
        output.append(self.conv_sub2(x, train=train))

        # sub 4: 0.25x through layer3-4 + PPM
        x = resize(x, scale_factor=0.5, mode="bilinear",
                   align_corners=self.align_corners)
        x = self.backbone.forward_layer(2, x, train=train)
        x = self.backbone.forward_layer(3, x, train=train)
        psp_outs = self.psp_modules(x, train=train) + [x]
        x = self.psp_bottleneck(jnp.concatenate(psp_outs, axis=-1),
                                train=train)
        output.append(self.conv_sub4(x, train=train))
        return output
