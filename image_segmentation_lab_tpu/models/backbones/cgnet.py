"""CGNet backbone (Wu et al., TIP 2020; mmseg ``CGNet`` semantics).

Beyond-reference lightweight family.  Each Context-Guided block learns
a joint local+surrounding representation — a depthwise 3x3 (local) and
a dilated depthwise 3x3 (surrounding) over a shared 1x1-reduced input,
concatenated, BN+PReLU'd — then a squeeze-excite global-context gate.
Stage entries downsample (stride-2, channel-doubling, 1x1 bottleneck);
the raw image is re-injected at 1/2 and 1/4 via stacked avg-pools.
TPU notes: the depthwise pair shares one input so XLA fuses both into
one VPU pass; everything else is 1x1 MXU work; PReLU is a single
lane-broadcast select.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...ops.pooling import avg_pool2d
from ..basic.activations import PReLU
from ..basic.convolution import Conv2d, Linear
from ..builder import build_norm_layer
from ..common.conv_module import ConvModule
from .resnet import _norm_cfg


class GlobalContextExtractor(nn.Module):
    """Squeeze-excite gate (mmseg ``GlobalContextExtractor``)."""

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.mean(x, axis=(1, 2))                       # (N, C)
        y = nn.relu(Linear(self.channel, self.channel // self.reduction,
                           name="fc1")(y))
        y = nn.sigmoid(Linear(self.channel // self.reduction, self.channel,
                              name="fc2")(y))
        return x * y[:, None, None, :]


class ContextGuidedBlock(nn.Module):
    """mmseg ``ContextGuidedBlock``: loc+sur depthwise pair + GCE gate."""

    in_channels: int
    out_channels: int
    dilation: int = 2
    reduction: int = 16
    skip_connect: bool = True
    downsample: bool = False
    norm_cfg: Optional[Dict] = None
    trainable: bool = True
    norm_force_eval: bool = False

    def setup(self):
        channels = (self.out_channels if self.downsample
                    else self.out_channels // 2)
        self.channels = channels
        ncfg = _norm_cfg(self.norm_cfg or dict(type="BN"), self.trainable,
                         self.norm_force_eval)
        k, s = (3, 2) if self.downsample else (1, 1)
        self.conv1x1 = ConvModule(
            self.in_channels, channels, k, stride=s, padding=(k - 1) // 2,
            norm_cfg=dict(ncfg),
            act_cfg=dict(type="PReLU", num_parameters=channels))
        kw = dict(trainable=self.trainable, bias=False, groups=channels)
        self.f_loc = Conv2d(channels, channels, 3, padding=1, **kw)
        self.f_sur = Conv2d(channels, channels, 3, padding=self.dilation,
                            dilation=self.dilation, **kw)
        self.bn = build_norm_layer(dict(ncfg), 2 * channels)[1]
        self.activate = PReLU(2 * channels)
        if self.downsample:
            self.bottleneck = Conv2d(2 * channels, self.out_channels, 1,
                                     bias=False, trainable=self.trainable)
        self.f_glo = GlobalContextExtractor(self.out_channels,
                                            self.reduction)

    def __call__(self, x, train: bool = False):
        out = self.conv1x1(x, train=train)
        joi = jnp.concatenate([self.f_loc(out), self.f_sur(out)], axis=-1)
        joi = self.activate(self.bn(joi, train=train))
        if self.downsample:
            joi = self.bottleneck(joi)
        out = self.f_glo(joi)
        if self.skip_connect and not self.downsample:
            return x + out
        return out


def _input_injection(x: jnp.ndarray, num_downsamplings: int) -> jnp.ndarray:
    """mmseg ``InputInjection``: stacked 3x3/s2 avg-pools of the image."""
    for _ in range(num_downsamplings):
        x = avg_pool2d(x, 3, 2, padding=1)
    return x


@BACKBONE.register()
class CGNet(nn.Module):
    """mmseg ``CGNet``: 3-level outputs at 1/2, 1/4, 1/8 resolution."""

    in_channels: int = 3
    num_channels: Sequence[int] = (32, 64, 128)
    num_blocks: Sequence[int] = (3, 21)
    dilations: Sequence[int] = (2, 4)
    reductions: Sequence[int] = (8, 16)
    norm_cfg: Optional[Dict] = None
    norm_eval: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        assert len(self.num_channels) == 3
        assert len(self.num_blocks) == len(self.dilations) == \
            len(self.reductions) == 2
        ncfg = _norm_cfg(self.norm_cfg or dict(type="BN", requires_grad=True),
                         True, self.norm_eval)
        nc = self.num_channels

        cur = self.in_channels
        stem = []
        for i in range(3):
            stem.append(ConvModule(
                cur, nc[0], 3, stride=2 if i == 0 else 1, padding=1,
                norm_cfg=dict(ncfg),
                act_cfg=dict(type="PReLU", num_parameters=nc[0])))
            cur = nc[0]
        self.stem = stem

        cur += self.in_channels
        self.norm_prelu_0 = (build_norm_layer(dict(ncfg), cur)[1],
                             PReLU(cur))

        self.level1 = [
            ContextGuidedBlock(
                cur if i == 0 else nc[1], nc[1], self.dilations[0],
                self.reductions[0], downsample=(i == 0),
                norm_cfg=self.norm_cfg, norm_force_eval=self.norm_eval,
                name=f"level1_{i}")
            for i in range(self.num_blocks[0])
        ]
        cur = 2 * nc[1] + self.in_channels
        self.norm_prelu_1 = (build_norm_layer(dict(ncfg), cur)[1],
                             PReLU(cur))

        self.level2 = [
            ContextGuidedBlock(
                cur if i == 0 else nc[2], nc[2], self.dilations[1],
                self.reductions[1], downsample=(i == 0),
                norm_cfg=self.norm_cfg, norm_force_eval=self.norm_eval,
                name=f"level2_{i}")
            for i in range(self.num_blocks[1])
        ]
        cur = 2 * nc[2]
        self.norm_prelu_2 = (build_norm_layer(dict(ncfg), cur)[1],
                             PReLU(cur))

    def __call__(self, x, train: bool = False):
        inp_2x = _input_injection(x, 1)
        inp_4x = _input_injection(x, 2)

        for layer in self.stem:
            x = layer(x, train=train)
        norm, prelu = self.norm_prelu_0
        x = prelu(norm(jnp.concatenate([x, inp_2x], axis=-1), train=train))
        outs = [x]

        down1 = None
        for i, layer in enumerate(self.level1):
            x = layer(x, train=train)
            if i == 0:
                down1 = x
        norm, prelu = self.norm_prelu_1
        x = prelu(norm(jnp.concatenate([x, down1, inp_4x], axis=-1),
                       train=train))
        outs.append(x)

        down2 = None
        for i, layer in enumerate(self.level2):
            x = layer(x, train=train)
            if i == 0:
                down2 = x
        norm, prelu = self.norm_prelu_2
        x = prelu(norm(jnp.concatenate([down2, x], axis=-1), train=train))
        outs.append(x)
        return tuple(outs)
