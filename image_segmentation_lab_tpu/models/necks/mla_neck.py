"""MLA neck (SETR-MLA — Zheng et al., CVPR 2021; mmseg ``MLANeck``
semantics).

Beyond-reference family.  Multi-Level feature Aggregation for ViT-style
isotropic backbones: each selected transformer level is LayerNormed,
1x1-projected, aggregated top-down by cumulative addition (deepest
level first), and refined with a 3x3 conv.  mmseg flattens NCHW to
tokens for the LN round-trip; NHWC makes that a plain channel-axis
LayerNorm.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

from flax import linen as nn

from ...core.registry_hub import NECK
from ..builder import build_norm_layer
from ..common.conv_module import ConvModule


class MLAModule(nn.Module):
    """mmseg ``MLAModule``: 1x1 proj → reversed cumulative sum → 3x3."""

    in_channels: Sequence[int]
    out_channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    def setup(self):
        kw = dict(norm_cfg=self.norm_cfg, act_cfg=self.act_cfg)
        self.channel_proj = [
            ConvModule(c, self.out_channels, 1, **kw)
            for c in self.in_channels
        ]
        self.feat_extract = [
            ConvModule(self.out_channels, self.out_channels, 3, padding=1,
                       **kw)
            for _ in self.in_channels
        ]

    def __call__(self, inputs, train: bool = False):
        feats = [conv(x, train=train)
                 for x, conv in zip(inputs, self.channel_proj)]
        feats = feats[::-1]                      # deepest level first
        mids = []
        for feat in feats:
            mids.append(feat if not mids else mids[-1] + feat)
        return tuple(conv(mid, train=train)
                     for mid, conv in zip(mids, self.feat_extract))


@NECK.register()
class MLANeck(nn.Module):
    """mmseg ``MLANeck``: per-level LN + MLAModule."""

    in_channels: Sequence[int] = None
    out_channels: int = 256
    norm_layer: Optional[Dict] = None      # default LN(eps=1e-6)
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        assert isinstance(self.in_channels, (list, tuple))
        norm_layer = dict(self.norm_layer
                          or dict(type="LayerNorm", eps=1e-6,
                                  requires_grad=True))
        self.norms = [
            build_norm_layer(dict(norm_layer), c, postfix=i)[1]
            for i, c in enumerate(self.in_channels)
        ]
        self.mla = MLAModule(self.in_channels, self.out_channels,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg)

    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        # NHWC: mmseg's flatten→LN→reshape round-trip is a channel LN
        outs = [norm(x) for norm, x in zip(self.norms, inputs)]
        return self.mla(outs, train=train)
