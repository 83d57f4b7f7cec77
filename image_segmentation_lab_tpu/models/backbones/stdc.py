"""STDC backbone + BiSeNetV1-style context path (Fan et al., CVPR 2021,
"Rethinking BiSeNet for Real-time Semantic Segmentation"; mmseg
``STDCNet``/``STDCContextPathNet`` structure).

Beyond-reference realtime family.  The Short-Term Dense Concatenate
module replaces plain conv stages: block i produces out/2^i channels
(the last two tie), all block outputs concatenate — receptive field and
channel budget both graded within one module, everything dense
3x3/1x1 conv+BN+ReLU on the MXU.  The stride-2 variant strides block 2
and average-pools block 1's output so the concat stays aligned (paper
Fig. 3b).

``STDCContextPathNet`` adds the BiSeNet context path: attention
refinement (gap -> 1x1 -> BN -> sigmoid gate) on the 1/16 and 1/32
stages, a global-context tap, top-down fusion convs, and the
feature-fusion module joining the 1/8 spatial path — tapping
``(ffm_out, arm16_out, arm32_out, stage3)`` for the decode/aux/detail
heads.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...ops.pooling import avg_pool2d
from ...utils.ops import resize
from ..common.conv_module import ConvModule

ARCH = {
    "STDCNet1": (1, 1, 1),   # extra (beyond the strided) modules per stage
    "STDCNet2": (3, 4, 2),
}


class STDCModule(nn.Module):
    in_channels: int
    out_channels: int
    stride: int = 1
    num_convs: int = 4
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = self.act_cfg or {"type": "ReLU"}
        out = self.out_channels
        # block channel plan: out/2, out/4, ..., last two equal
        chans = [out // (2 ** (i + 1)) for i in range(self.num_convs - 1)]
        chans.append(out - sum(chans))
        outs = []
        h = ConvModule(self.in_channels, chans[0], 1, norm_cfg=self.norm_cfg,
                       act_cfg=act, name="conv0")(x, train=train)
        skip = avg_pool2d(h, 3, 2, 1) if self.stride == 2 else h
        outs.append(skip)
        for i in range(1, self.num_convs):
            stride = self.stride if i == 1 else 1
            h = ConvModule(chans[i - 1], chans[i], 3, stride=stride,
                           padding=1, norm_cfg=self.norm_cfg, act_cfg=act,
                           name=f"conv{i}")(h, train=train)
            outs.append(h)
        return jnp.concatenate(outs, axis=-1)


@BACKBONE.register("STDCNet")
class STDCNet(nn.Module):
    stdc_type: str = "STDCNet1"
    in_channels: int = 3
    channels: Sequence[int] = (32, 64, 256, 512, 1024)
    num_convs: int = 4
    out_indices: Sequence[int] = (2, 3, 4)
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = None
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        if self.stdc_type not in ARCH:
            raise KeyError(f"unknown stdc_type {self.stdc_type!r}; "
                           f"choose from {sorted(ARCH)}")
        act = self.act_cfg or {"type": "ReLU"}
        c = self.channels
        self.stem = [
            ConvModule(self.in_channels, c[0], 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=act),
            ConvModule(c[0], c[1], 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=act),
        ]
        extra = ARCH[self.stdc_type]
        stages = []
        for si in range(3):
            mods = [STDCModule(c[si + 1], c[si + 2], stride=2,
                               num_convs=self.num_convs,
                               norm_cfg=self.norm_cfg, act_cfg=act)]
            mods += [STDCModule(c[si + 2], c[si + 2], stride=1,
                                num_convs=self.num_convs,
                                norm_cfg=self.norm_cfg, act_cfg=act)
                     for _ in range(extra[si])]
            stages.append(mods)
        self.stages = stages

    def __call__(self, x, train: bool = False):
        for conv in self.stem:
            x = conv(x, train=train)
        outs, feats = [], [None, None]  # stem taps unused
        for si, mods in enumerate(self.stages):
            for mod in mods:
                x = mod(x, train=train)
            feats.append(x)
        outs = [feats[i] for i in self.out_indices]
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)


class AttentionRefinementModule(nn.Module):
    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(self.in_channels, self.out_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, name="conv_layer")(
            x, train=train)
        att = jnp.mean(x, axis=(1, 2), keepdims=True)
        att = ConvModule(self.out_channels, self.out_channels, 1,
                         norm_cfg=self.norm_cfg, act_cfg=None,
                         name="atten_conv_layer")(att, train=train)
        return x * nn.sigmoid(att)


class STDCFeatureFusion(nn.Module):
    """BiSeNetV1 FFM: concat -> conv -> channel attention residual."""

    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    @nn.compact
    def __call__(self, spatial, context, train: bool = False):
        x = jnp.concatenate([spatial, context], axis=-1)
        x = ConvModule(self.in_channels, self.out_channels, 1,
                       norm_cfg=self.norm_cfg, name="conv0")(x, train=train)
        att = jnp.mean(x, axis=(1, 2), keepdims=True)
        att = ConvModule(self.out_channels, self.out_channels // 4, 1,
                         act_cfg=dict(type="ReLU"), name="conv1")(
            att, train=train)
        att = ConvModule(self.out_channels // 4, self.out_channels, 1,
                         act_cfg=None, name="conv2")(att, train=train)
        att = nn.sigmoid(att)
        return x * att + x


@BACKBONE.register("STDCContextPathNet")
class STDCContextPathNet(nn.Module):
    backbone_cfg: Dict = None
    last_in_channels: Tuple[int, int] = (1024, 512)
    out_channels: int = 128
    ffm_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    align_corners: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        from ..builder import build_module_from_cfg
        assert self.backbone_cfg is not None
        self.backbone_net = build_module_from_cfg(
            dict(self.backbone_cfg, norm_cfg=self.backbone_cfg.get(
                "norm_cfg", self.norm_cfg)), BACKBONE,
            dict(name="backbone_net"))
        self.arms = [
            AttentionRefinementModule(ch, self.out_channels,
                                      norm_cfg=self.norm_cfg)
            for ch in self.last_in_channels
        ]
        self.convs = [
            ConvModule(self.out_channels, self.out_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg)
            for _ in self.last_in_channels
        ]
        self.conv_avg = ConvModule(self.last_in_channels[0],
                                   self.out_channels, 1,
                                   norm_cfg=self.norm_cfg)
        ffm = self.ffm_cfg or dict(in_channels=512, out_channels=256)
        self.ffm = STDCFeatureFusion(ffm["in_channels"],
                                     ffm["out_channels"],
                                     norm_cfg=self.norm_cfg)

    def __call__(self, x, train: bool = False):
        outs = list(self.backbone_net(x, train=train))  # (1/8, 1/16, 1/32)
        avg = jnp.mean(outs[-1], axis=(1, 2), keepdims=True)
        avg_feat = self.conv_avg(avg, train=train)
        feature_up = resize(avg_feat, size=outs[-1].shape[1:3],
                            mode="nearest")
        arms_out = []
        for i in range(len(self.arms)):
            feat = self.arms[i](outs[-(i + 1)], train=train) + feature_up
            feature_up = resize(feat, size=outs[-(i + 2)].shape[1:3],
                                mode="nearest")
            feature_up = self.convs[i](feature_up, train=train)
            arms_out.append(feature_up)
        ffm_out = self.ffm(outs[0], arms_out[1], train=train)
        # (ffm 1/8, context 1/16, context 1/8-refined, raw stage3 1/8)
        return tuple([ffm_out] + arms_out + [outs[0]])
