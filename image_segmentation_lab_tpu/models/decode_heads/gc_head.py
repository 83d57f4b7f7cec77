"""Global-Context decode head (GCNet — Cao et al., ICCVW 2019; mmseg
``GCHead`` + mmcv ``ContextBlock`` semantics).

Beyond-reference family.  The context block is the cheap cousin of
non-local attention: ONE softmax attention map shared by every query
position pools the features to a (1, 1, C) global context vector, which
a bottleneck (1x1 conv -> LayerNorm -> ReLU -> 1x1 conv) transforms and
adds back to every position.  Cost is O(HWC) versus non-local's
O((HW)^2 C) — on TPU it is one (L x 1) softmax and one (C x L)(L x 1)
matvec, a rounding error next to the head's 3x3 convs.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ..basic.convolution import Conv2d
from ..basic.normalization import LayerNorm
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


class ContextBlock(nn.Module):
    """mmcv ContextBlock: attention pooling + channel_add fusion."""

    in_channels: int
    ratio: float = 0.25
    pooling_type: str = "att"
    channel_mul: bool = False        # fusion_types: channel_add default

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, H, W, C = x.shape
        planes = int(C * self.ratio)
        if self.pooling_type == "att":
            mask = Conv2d(C, 1, 1, name="conv_mask")(x)      # (N, H, W, 1)
            mask = nn.softmax(mask.reshape(N, H * W, 1).astype(jnp.float32),
                              axis=1)
            context = jnp.einsum("nlc,nlo->noc", x.reshape(N, H * W, C),
                                 mask.astype(x.dtype))       # (N, 1, C)
            context = context.reshape(N, 1, 1, C)
        else:  # 'avg'
            context = jnp.mean(x, axis=(1, 2), keepdims=True)

        def bottleneck(name):
            y = Conv2d(C, planes, 1, name=f"{name}_fc1")(context)
            y = LayerNorm(planes, name=f"{name}_ln")(y)
            y = nn.relu(y)
            return Conv2d(planes, C, 1, name=f"{name}_fc2")(y)

        out = x
        if self.channel_mul:
            out = out * nn.sigmoid(bottleneck("channel_mul"))
        else:
            out = out + bottleneck("channel_add")
        return out


@DECODEHEAD.register()
class GCHead(BaseDecodeHead):
    ratio: float = 0.25
    pooling_type: str = "att"
    concat_input: bool = True

    def setup(self):
        super().setup()
        self.convs = [
            ConvModule(self.fused_in_channels, self.channels, 3, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                       act_cfg=self._act_cfg()),
            ConvModule(self.channels, self.channels, 3, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                       act_cfg=self._act_cfg()),
        ]
        self.gc_block = ContextBlock(self.channels, ratio=self.ratio,
                                     pooling_type=self.pooling_type)
        if self.concat_input:
            self.conv_cat = ConvModule(
                self.fused_in_channels + self.channels, self.channels, 3,
                padding=1, conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        out = self.convs[0](x, train=train)
        out = self.gc_block(out)
        out = self.convs[1](out, train=train)
        if self.concat_input:
            out = self.conv_cat(jnp.concatenate([x, out], axis=-1),
                                train=train)
        return self.cls_seg(out, train=train)
