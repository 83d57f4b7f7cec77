"""ERFNet backbone (Romera et al., T-ITS 2017; mmseg ``ERFNet``
semantics).

Beyond-reference realtime family.  The encoder interleaves
DownsamplerBlocks (stride-2 conv ∥ max-pool, concatenated) with
factorized Non-Bottleneck-1D residual blocks (3x1/1x3 pairs, the second
pair dilated); the decoder upsamples back to 1/2 resolution with
transposed convs (``ConvTranspose2d`` — torch-exact, lowered as an
input-dilated MXU conv) and plain NB1D blocks.  The 1-D factorized
convs are full dense convs on the MXU (not depthwise), so the factor-
ization is a straight FLOP saving.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...ops.pooling import max_pool2d
from ...utils.ops import resize
from ..basic.convolution import Conv2d, ConvTranspose2d
from ..basic.drop import Dropout
from ..builder import build_norm_layer
from .resnet import _norm_cfg


class DownsamplerBlock(nn.Module):
    """stride-2 3x3 conv (out-in channels) ∥ 2x2 max-pool, concat+BN+ReLU."""

    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    def setup(self):
        ncfg = _norm_cfg(self.norm_cfg or dict(type="BN"), True, False)
        self.conv = Conv2d(self.in_channels,
                           self.out_channels - self.in_channels, 3,
                           stride=2, padding=1)
        self.bn = build_norm_layer(ncfg, self.out_channels)[1]

    def __call__(self, x, train: bool = False):
        conv_out = self.conv(x)
        pool_out = max_pool2d(x, 2, 2)
        if pool_out.shape[1:3] != conv_out.shape[1:3]:   # odd inputs
            pool_out = resize(pool_out, size=conv_out.shape[1:3],
                              mode="bilinear", align_corners=False)
        out = jnp.concatenate([conv_out, pool_out], axis=-1)
        return nn.relu(self.bn(out, train=train))


class NonBottleneck1d(nn.Module):
    """Factorized residual block: (3x1 → 1x3) x2, second pair dilated."""

    channels: int
    drop_rate: float = 0.0
    dilation: int = 1
    norm_cfg: Optional[Dict] = None

    def setup(self):
        ncfg = _norm_cfg(self.norm_cfg or dict(type="BN"), True, False)
        C, d = self.channels, self.dilation
        self.conv1_v = Conv2d(C, C, (3, 1), padding=(1, 0))
        self.conv1_h = Conv2d(C, C, (1, 3), padding=(0, 1))
        self.bn1 = build_norm_layer(ncfg, C, postfix=1)[1]
        self.conv2_v = Conv2d(C, C, (3, 1), padding=(d, 0),
                              dilation=(d, 1))
        self.conv2_h = Conv2d(C, C, (1, 3), padding=(0, d),
                              dilation=(1, d))
        self.bn2 = build_norm_layer(ncfg, C, postfix=2)[1]
        self.dropout = Dropout(self.drop_rate)

    def __call__(self, x, train: bool = False):
        out = nn.relu(self.conv1_v(x))
        out = self.conv1_h(out)
        out = nn.relu(self.bn1(out, train=train))
        out = nn.relu(self.conv2_v(out))
        out = self.conv2_h(out)
        out = self.bn2(out, train=train)
        out = self.dropout(out, train=train)
        return nn.relu(out + x)


class UpsamplerBlock(nn.Module):
    """ConvTranspose2d(3, s2, p1, op1) + BN + ReLU."""

    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    def setup(self):
        ncfg = _norm_cfg(self.norm_cfg or dict(type="BN"), True, False)
        self.conv = ConvTranspose2d(self.in_channels, self.out_channels, 3,
                                    stride=2, padding=1, output_padding=1)
        self.bn = build_norm_layer(ncfg, self.out_channels)[1]

    def __call__(self, x, train: bool = False):
        return nn.relu(self.bn(self.conv(x), train=train))


@BACKBONE.register()
class ERFNet(nn.Module):
    """mmseg ``ERFNet``: returns the single 1/2-resolution decoder map."""

    in_channels: int = 3
    enc_downsample_channels: Sequence[int] = (16, 64, 128)
    enc_stage_non_bottlenecks: Sequence[int] = (5, 8)
    enc_non_bottleneck_dilations: Sequence[int] = (2, 4, 8, 16)
    dec_upsample_channels: Sequence[int] = (64, 16)
    dec_stages_non_bottleneck: Sequence[int] = (2, 2)
    dec_non_bottleneck_channels: Sequence[int] = (64, 16)
    dropout_ratio: float = 0.1
    norm_cfg: Optional[Dict] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        enc_ch = self.enc_downsample_channels
        assert len(enc_ch) - 1 == len(self.enc_stage_non_bottlenecks)
        assert len(self.dec_upsample_channels) == \
            len(self.dec_stages_non_bottleneck) == \
            len(self.dec_non_bottleneck_channels)
        assert self.enc_stage_non_bottlenecks[-1] % \
            len(self.enc_non_bottleneck_dilations) == 0
        kw = dict(norm_cfg=self.norm_cfg)

        encoder = [DownsamplerBlock(self.in_channels, enc_ch[0], **kw)]
        for i in range(len(enc_ch) - 1):
            encoder.append(DownsamplerBlock(enc_ch[i], enc_ch[i + 1], **kw))
            if i == len(enc_ch) - 2:
                reps = (self.enc_stage_non_bottlenecks[-1]
                        // len(self.enc_non_bottleneck_dilations))
                for _ in range(reps):
                    for d in self.enc_non_bottleneck_dilations:
                        encoder.append(NonBottleneck1d(
                            enc_ch[-1], self.dropout_ratio, d, **kw))
            else:
                for _ in range(self.enc_stage_non_bottlenecks[i]):
                    encoder.append(NonBottleneck1d(
                        enc_ch[i + 1], self.dropout_ratio, **kw))
        self.encoder = encoder

        decoder = []
        dec_ch = self.dec_non_bottleneck_channels
        for i in range(len(self.dec_upsample_channels)):
            src = enc_ch[-1] if i == 0 else dec_ch[i - 1]
            decoder.append(UpsamplerBlock(src, dec_ch[i], **kw))
            for _ in range(self.dec_stages_non_bottleneck[i]):
                decoder.append(NonBottleneck1d(dec_ch[i], 0.0, 1, **kw))
        self.decoder = decoder

    def __call__(self, x, train: bool = False):
        for enc in self.encoder:
            x = enc(x, train=train)
        for dec in self.decoder:
            x = dec(x, train=train)
        return (x,)
