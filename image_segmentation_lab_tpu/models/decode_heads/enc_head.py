"""Context Encoding decode head (EncNet — Zhang et al., CVPR 2018; mmseg
``EncHead`` semantics).

Beyond-reference family.  A learned dictionary of K codewords summarizes
the scene: soft-assignment residual encoding (the Encoding layer —
softmax over ``-s_k ||x_i - c_k||^2``, residual aggregation), a
channel-gating vector from the encoded statistic (fc + sigmoid, applied
as ``x * (1 + gamma)``), and an auxiliary **semantic-encoding loss** —
a per-image multi-label BCE predicting which classes are present, which
regularizes the encoding toward scene content.

TPU notes: the pairwise pixel/codeword distances expand to
``||x||^2 - 2 x.c + ||c||^2`` so the dominant term is one (HW x C)(C x K)
MXU matmul; the aggregation is its transpose pair.  K is 32 — everything
stays lane-aligned.  The presence target is a static-shape scatter
(one-hot sum over valid pixels).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import uniform_
from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from ..basic.convolution import Linear
from ..basic.normalization import BatchNorm2d
from ..builder import build_loss
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


class Encoding(nn.Module):
    """Residual dictionary encoding (Zhang et al.; mmcv Encoding)."""

    channels: int
    num_codes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (N, L, C) -> encoded (N, K, C)
        C, K = self.channels, self.num_codes
        std = 1.0 / ((K * C) ** 0.5)
        codewords = self.param("codewords", uniform_(-std, std), (K, C))
        scale = self.param("scale", uniform_(-1.0, 0.0), (K,))
        x32 = x.astype(jnp.float32)
        cw = codewords.astype(jnp.float32)
        # scaled L2: s_k * (||x||^2 - 2 x.c_k + ||c_k||^2)
        x_sq = jnp.sum(x32 * x32, axis=-1, keepdims=True)      # (N, L, 1)
        c_sq = jnp.sum(cw * cw, axis=-1)                       # (K,)
        xc = jnp.einsum("nlc,kc->nlk", x32, cw,
                        preferred_element_type=jnp.float32)
        dist = scale.astype(jnp.float32) * (x_sq - 2.0 * xc + c_sq)
        assign = nn.softmax(dist, axis=2)                      # (N, L, K)
        # sum_i w_ik (x_i - c_k)
        encoded = (jnp.einsum("nlk,nlc->nkc", assign, x32)
                   - jnp.sum(assign, axis=1)[..., None] * cw)
        return encoded.astype(x.dtype)


class EncModule(nn.Module):
    """Encoding -> BN1d(K) -> ReLU -> mean over K -> fc+sigmoid gate."""

    in_channels: int
    num_codes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        N, H, W, C = x.shape
        encoded = Encoding(C, self.num_codes, name="encoding")(
            x.reshape(N, H * W, C))
        # torch BN1d(num_codes) on (N, K, C): K is the channel axis —
        # channels-last here means feeding (N, C, K)
        encoded = BatchNorm2d(self.num_codes, name="norm")(
            encoded.swapaxes(1, 2), train=train)
        encoded = nn.relu(encoded).mean(axis=-1)               # (N, C)
        gamma = nn.sigmoid(Linear(C, C, name="fc")(encoded))   # (N, C)
        output = nn.relu(x + x * gamma[:, None, None, :])
        return encoded, output


@DECODEHEAD.register()
class EncHead(BaseDecodeHead):
    num_codes: int = 32
    use_se_loss: bool = True
    add_lateral: bool = False
    loss_se_decode: dict = None

    def setup(self):
        super().setup()
        self.bottleneck = ConvModule(
            self.in_channels[-1], self.channels, 3, padding=1,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg())
        if self.add_lateral:
            self.lateral_convs = [
                ConvModule(ch, self.channels, 1, conv_cfg=self.conv_cfg,
                           norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())
                for ch in self.in_channels[:-1]
            ]
            self.fusion = ConvModule(
                len(self.in_channels) * self.channels, self.channels, 3,
                padding=1, conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg())
        self.enc_module = EncModule(self.channels, self.num_codes)
        if self.use_se_loss:
            self.se_layer = Linear(self.channels, self.num_classes)
            self.loss_se = build_loss(
                self.loss_se_decode
                or dict(type="CrossEntropyLoss", use_sigmoid=True,
                        loss_weight=0.2))

    def _forward(self, inputs, train: bool = False):
        feats = [inputs[i] for i in self.in_index]
        feat = self.bottleneck(feats[-1], train=train)
        if self.add_lateral:
            laterals = [
                resize(conv(feats[i], train=train), size=feat.shape[1:3],
                       mode="bilinear", align_corners=self.align_corners)
                for i, conv in enumerate(self.lateral_convs)
            ]
            feat = self.fusion(jnp.concatenate([feat] + laterals, axis=-1),
                               train=train)
        encoded, output = self.enc_module(feat, train=train)
        output = self.cls_seg(output, train=train)
        if self.use_se_loss:
            return output, self.se_layer(encoded)
        return output

    def __call__(self, inputs, train: bool = False):
        return self._forward(inputs, train=train)

    def forward_test(self, inputs, train: bool = False):
        out = self._forward(inputs, train=train)
        return out[0] if self.use_se_loss else out

    def forward_train(self, inputs, gt_semantic_seg, meta_infos=None,
                      rescale: bool = False, train: bool = True):
        raw = self._forward(inputs, train=train)
        if not self.use_se_loss:
            return super(EncHead, self).losses(raw, gt_semantic_seg,
                                               meta_infos, rescale=rescale)
        seg_logits, se_logits = raw
        logits, losses = self.losses(seg_logits, gt_semantic_seg,
                                     meta_infos, rescale=rescale)
        # multi-label presence target: class k present iff any valid pixel
        K = self.num_classes
        gt = gt_semantic_seg
        valid = (gt != self.ignore_index) & (gt >= 0) & (gt < K)
        onehot = jax.nn.one_hot(jnp.clip(gt, 0, K - 1), K) \
            * valid[..., None]
        present = (jnp.sum(onehot, axis=(1, 2)) > 0).astype(jnp.float32)
        losses["loss_se"] = self.loss_se(
            se_logits[:, None, None, :], present[:, None, None, :])
        return logits, losses
