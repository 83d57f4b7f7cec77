"""Asymmetric Non-local Neural Network decode head (ANNHead — Zhu et
al., ICCV 2019; mmseg ``ANNHead`` structure).

Beyond-reference family.  Non-local attention made cheap by shrinking
the KEY/VALUE side to a pyramid-pooled sample set (1+9+36+64 = 110
positions by default) while queries stay dense:

* **AFNB** (fusion): stage-4 features query the pyramid-pooled stage-3
  features; the context concatenates onto the high-res input through a
  1x1 bottleneck (no act, residual-style).
* **APNB** (pyramid non-local): self-attention of the bottlenecked
  features against their own pyramid-pooled sample set, context
  concatenated and fused.

Both ride the shared ``SelfAttentionBlock``
(``models/utils/self_attention_block.py``) — with only ~110 keys the
score tensor is (HW x 110), a thin well-tiled MXU matmul instead of
non-local's (HW x HW).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...ops.pooling import adaptive_avg_pool2d, max_pool2d
from ..common.conv_module import ConvModule
from ..utils.self_attention_block import SelfAttentionBlock
from .decode_head import BaseDecodeHead


class PPMConcat(nn.Module):
    """Adaptive-pool an NHWC map to each scale, flatten and concat the
    samples -> (N, sum(s^2), C)."""

    pool_scales: Sequence[int] = (1, 3, 6, 8)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, _, _, C = x.shape
        outs = [adaptive_avg_pool2d(x, s).reshape(N, s * s, C)
                for s in self.pool_scales]
        return jnp.concatenate(outs, axis=1)


def _query_pool(scale: int):
    if scale == 1:
        return None
    return lambda x: max_pool2d(x, scale, scale)


class AFNB(nn.Module):
    """Asymmetric fusion non-local block."""

    low_in_channels: int
    high_in_channels: int
    channels: int
    out_channels: int
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)
    conv_cfg: dict = None
    norm_cfg: dict = None
    act_cfg: dict = None

    def setup(self):
        self.stages = [
            SelfAttentionBlock(
                key_in_channels=self.low_in_channels,
                query_in_channels=self.high_in_channels,
                channels=self.channels, out_channels=self.out_channels,
                share_key_query=False, query_downsample=_query_pool(s),
                key_downsample=PPMConcat(self.key_pool_scales),
                key_query_num_convs=1, key_query_norm=False,
                value_out_num_convs=1, value_out_norm=False,
                matmul_norm=True, with_out=True, conv_cfg=self.conv_cfg,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg)
            for s in self.query_scales
        ]
        self.bottleneck = ConvModule(
            self.out_channels + self.high_in_channels, self.out_channels, 1,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg, act_cfg=None)

    def __call__(self, low_feats, high_feats, train: bool = False):
        context = sum(stage(high_feats, low_feats, train=train)
                      for stage in self.stages)
        return self.bottleneck(
            jnp.concatenate([context, high_feats], axis=-1), train=train)


class APNB(nn.Module):
    """Asymmetric pyramid non-local block (self attention)."""

    in_channels: int
    channels: int
    out_channels: int
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)
    conv_cfg: dict = None
    norm_cfg: dict = None
    act_cfg: dict = None

    def setup(self):
        self.stages = [
            SelfAttentionBlock(
                key_in_channels=self.in_channels,
                query_in_channels=self.in_channels,
                channels=self.channels, out_channels=self.in_channels,
                share_key_query=True, query_downsample=_query_pool(s),
                key_downsample=PPMConcat(self.key_pool_scales),
                key_query_num_convs=1, key_query_norm=False,
                value_out_num_convs=1, value_out_norm=False,
                matmul_norm=True, with_out=True, conv_cfg=self.conv_cfg,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg)
            for s in self.query_scales
        ]
        self.bottleneck = ConvModule(
            2 * self.in_channels, self.out_channels, 1,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg)

    def __call__(self, feats, train: bool = False):
        context = sum(stage(feats, feats, train=train)
                      for stage in self.stages)
        return self.bottleneck(
            jnp.concatenate([context, feats], axis=-1), train=train)


@DECODEHEAD.register()
class ANNHead(BaseDecodeHead):
    project_channels: int = 256
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)

    def setup(self):
        super().setup()
        assert len(self.in_channels) == 2, "ANNHead takes [low, high] feats"
        low_in, high_in = self.in_channels
        self.fusion = AFNB(
            low_in_channels=low_in, high_in_channels=high_in,
            channels=self.project_channels, out_channels=high_in,
            query_scales=self.query_scales,
            key_pool_scales=self.key_pool_scales, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())
        self.bottleneck = ConvModule(
            high_in, self.channels, 3, padding=1, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())
        self.context = APNB(
            in_channels=self.channels, channels=self.project_channels,
            out_channels=self.channels, query_scales=self.query_scales,
            key_pool_scales=self.key_pool_scales, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        low_feats, high_feats = self._transform_inputs(inputs)
        output = self.fusion(low_feats, high_feats, train=train)
        if self.dropout is not None:
            output = self.dropout(output, train=train)
        output = self.bottleneck(output, train=train)
        output = self.context(output, train=train)
        return self.cls_seg(output, train=train)
