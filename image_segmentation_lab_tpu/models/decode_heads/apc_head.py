"""Adaptive Pyramid Context decode head (APCNet — He et al., CVPR 2019;
mmseg ``APCHead`` + ACM semantics).

Beyond-reference family.  Each Adaptive Context Module (one per pool
scale s) pools the input to an (s, s) region grid, predicts a per-pixel
sigmoid affinity over the s² regions (Global-guided Local Affinity: a
1x1 conv on x + broadcast global vector), and reconstructs each pixel as
the affinity-weighted sum of region features — one (L x s²)(s² x C)
batched MXU einsum per scale.  Unlike non-local attention this is
O(HW·s²), so all four scales together cost less than one 3x3 conv of
the bottleneck.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...ops.pooling import adaptive_avg_pool2d
from ..basic.convolution import Conv2d
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


class ACM(nn.Module):
    """Adaptive Context Module (mmseg ``ACM``).

    NHWC redesign: the pooled region features stay (N, s², C); the
    affinity matmul is one einsum; the global-information branch is a
    broadcast add (mmseg's nearest-resize of a (1, 1) map ≡ broadcast).
    """

    pool_scale: int
    fusion: bool
    in_channels: int
    channels: int
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Optional[Dict] = None

    def setup(self):
        kw = dict(conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                  act_cfg=self.act_cfg)
        self.pooled_redu_conv = ConvModule(self.in_channels, self.channels,
                                           1, **kw)
        self.input_redu_conv = ConvModule(self.in_channels, self.channels,
                                          1, **kw)
        self.global_info = ConvModule(self.channels, self.channels, 1, **kw)
        self.gla = Conv2d(self.channels, self.pool_scale ** 2, 1)
        self.residual_conv = ConvModule(self.channels, self.channels, 1, **kw)
        if self.fusion:
            self.fusion_conv = ConvModule(self.channels, self.channels, 1,
                                          **kw)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pooled_x = adaptive_avg_pool2d(x, self.pool_scale)
        x = self.input_redu_conv(x, train=train)
        pooled_x = self.pooled_redu_conv(pooled_x, train=train)
        N, H, W, C = x.shape
        s2 = self.pool_scale ** 2
        pooled_x = pooled_x.reshape(N, s2, C)

        # Global-guided local affinity: x + broadcast global info vector.
        glob = self.global_info(jnp.mean(x, axis=(1, 2), keepdims=True),
                                train=train)                  # (N, 1, 1, C)
        affinity = self.gla(x + glob).reshape(N, H * W, s2)
        affinity = nn.sigmoid(affinity)

        z = jnp.einsum("nls,nsc->nlc", affinity, pooled_x,
                       preferred_element_type=jnp.float32)
        z = z.astype(x.dtype).reshape(N, H, W, C)
        z = self.residual_conv(z, train=train)
        z = nn.relu(z + x)
        if self.fusion:
            z = self.fusion_conv(z, train=train)
        return z


@DECODEHEAD.register()
class APCHead(BaseDecodeHead):
    """mmseg ``APCHead``: concat [x, ACM(s) per scale] → 3x3 bottleneck."""

    pool_scales: Sequence[int] = (1, 2, 3, 6)
    fusion: bool = True

    def setup(self):
        super().setup()
        self.acm_modules = [
            ACM(s, self.fusion, self.fused_in_channels, self.channels,
                conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg())
            for s in self.pool_scales
        ]
        self.bottleneck = ConvModule(
            self.fused_in_channels + len(self.pool_scales) * self.channels,
            self.channels, 3, padding=1, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        outs = [x] + [acm(x, train=train) for acm in self.acm_modules]
        out = self.bottleneck(jnp.concatenate(outs, axis=-1), train=train)
        return self.cls_seg(out, train=train)
