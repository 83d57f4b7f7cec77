"""Fast-SCNN backbone (Poudel et al., BMVC 2019) — realtime two-branch
segmentation network, assembled from this framework's existing blocks.

Beyond-reference family (reference ships no realtime two-branch CNN
besides BiSeNetV2/ICNet analogs).  Derived from the paper's architecture
table with mmseg's FastSCNN module naming:

* **LearningToDownsample**: conv 3x3/s2 then two depthwise-separable
  convs /s2 — the shared 1/8-resolution stem (higher-res branch tap).
* **GlobalFeatureExtractor**: three MobileNetV2 inverted-residual stages
  (expand 6, channels/strides configurable) + PPM pyramid pooling, to
  1/32 (lower-res tap).
* **FeatureFusionModule**: lower branch 4x bilinear up -> 3x3 depthwise
  conv (with BN+ReLU) -> 1x1 conv (no act); higher branch 1x1 conv (no
  act); sum then ReLU (paper Table 2 fusion) — the 1/8 fusion tap.

Everything is ConvModule/InvertedResidual/PPM machinery, so the whole
network is the dense-conv MXU pipeline XLA already runs near peak
(docs/PERF.md cost model).  ``out_indices`` taps
(higher_res, lower_res, fusion) like the mmseg original — the FCN-style
decode head consumes the fusion output, aux heads the two branches.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...utils.ops import resize
from ..common.conv_module import ConvModule
from ..decode_heads.psp_head import PPM
from ..utils.depthwise_separable_conv_module import \
    DepthwiseSeparableConvModule
from ..utils.inverted_residual import InvertedResidual

_DEF = object()


class LearningToDownsample(nn.Module):
    in_channels: int
    dw_channels: Tuple[int, int]
    out_channels: int
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = _DEF

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = {"type": "ReLU"} if self.act_cfg is _DEF else self.act_cfg
        c1, c2 = self.dw_channels
        x = ConvModule(self.in_channels, c1, 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=act, name="conv")(
            x, train=train)
        x = DepthwiseSeparableConvModule(
            c1, c2, 3, stride=2, padding=1, norm_cfg=self.norm_cfg,
            name="dsconv1")(x, train=train)
        x = DepthwiseSeparableConvModule(
            c2, self.out_channels, 3, stride=2, padding=1,
            norm_cfg=self.norm_cfg, name="dsconv2")(x, train=train)
        return x


class GlobalFeatureExtractor(nn.Module):
    in_channels: int
    block_channels: Tuple[int, int, int]
    out_channels: int
    expand_ratio: int = 6
    num_blocks: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (2, 2, 1)
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = _DEF
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = {"type": "ReLU"} if self.act_cfg is _DEF else self.act_cfg
        in_ch = self.in_channels
        for i, (ch, n, s) in enumerate(zip(self.block_channels,
                                           self.num_blocks, self.strides)):
            for j in range(n):
                x = InvertedResidual(
                    in_ch if j == 0 else ch, ch,
                    stride=s if j == 0 else 1,
                    expand_ratio=self.expand_ratio, norm_cfg=self.norm_cfg,
                    act_cfg=act, name=f"bottleneck{i}_{j}")(x, train=train)
            in_ch = ch
        ppm_out = PPM(self.pool_scales, in_ch, in_ch // 4,
                      norm_cfg=self.norm_cfg, act_cfg=act,
                      align_corners=self.align_corners, name="ppm")(
            x, train=train)
        x = jnp.concatenate([x] + list(ppm_out), axis=-1)
        x = ConvModule(in_ch * 2, self.out_channels, 1,
                       norm_cfg=self.norm_cfg, act_cfg=act, name="out")(
            x, train=train)
        return x


class FeatureFusionModule(nn.Module):
    higher_in_channels: int
    lower_in_channels: int
    out_channels: int
    scale_factor: int = 4
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = _DEF
    align_corners: bool = False

    @nn.compact
    def __call__(self, higher, lower, train: bool = False):
        act = {"type": "ReLU"} if self.act_cfg is _DEF else self.act_cfg
        size = (lower.shape[1] * self.scale_factor,
                lower.shape[2] * self.scale_factor)
        low = resize(lower, size=size, mode="bilinear",
                     align_corners=self.align_corners)
        low = ConvModule(self.lower_in_channels, self.lower_in_channels, 3,
                         padding=1, groups=self.lower_in_channels,
                         norm_cfg=self.norm_cfg, act_cfg=act,
                         name="dwconv")(low, train=train)
        low = ConvModule(self.lower_in_channels, self.out_channels, 1,
                         norm_cfg=self.norm_cfg, act_cfg=None,
                         name="conv_lower_res")(low, train=train)
        high = ConvModule(self.higher_in_channels, self.out_channels, 1,
                          norm_cfg=self.norm_cfg, act_cfg=None,
                          name="conv_higher_res")(higher, train=train)
        return nn.relu(low + high)


@BACKBONE.register("FastSCNN")
class FastSCNN(nn.Module):
    in_channels: int = 3
    downsample_dw_channels: Tuple[int, int] = (32, 48)
    global_in_channels: int = 64
    global_block_channels: Tuple[int, int, int] = (64, 96, 128)
    global_block_strides: Tuple[int, int, int] = (2, 2, 1)
    global_out_channels: int = 128
    higher_in_channels: int = 64
    lower_in_channels: int = 128
    fusion_out_channels: int = 128
    out_indices: Sequence[int] = (0, 1, 2)
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = _DEF
    align_corners: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        assert self.global_in_channels == self.higher_in_channels
        assert self.global_out_channels == self.lower_in_channels
        self.learning_to_downsample = LearningToDownsample(
            self.in_channels, self.downsample_dw_channels,
            self.global_in_channels, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg)
        self.global_feature_extractor = GlobalFeatureExtractor(
            self.global_in_channels, self.global_block_channels,
            self.global_out_channels, strides=self.global_block_strides,
            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            align_corners=self.align_corners)
        self.feature_fusion = FeatureFusionModule(
            self.higher_in_channels, self.lower_in_channels,
            self.fusion_out_channels, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, align_corners=self.align_corners)

    def __call__(self, x, train: bool = False):
        higher = self.learning_to_downsample(x, train=train)
        lower = self.global_feature_extractor(higher, train=train)
        fusion = self.feature_fusion(higher, lower, train=train)
        outs = [higher, lower, fusion]
        outs = [outs[i] for i in self.out_indices]
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
