"""Disentangled Non-Local decode head (DNLNet — Yin et al., ECCV 2020;
mmseg ``DNLHead`` semantics).

Beyond-reference family.  The DNL block disentangles non-local attention
into a *whitened pairwise* term (theta/phi are mean-subtracted over the
spatial axis before the dot product, with a softmax temperature) and a
*unary* term (a 1x1-conv saliency map, softmaxed over positions, pooling
g to one global vector added to every position).  Both terms are batched
MXU einsums over the flattened spatial axis, sharing the existing
``NonLocal2d`` layout conventions (L on sublanes, channels on lanes,
f32 softmax accumulation).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import normal_
from ...core.registry_hub import DECODEHEAD
from ..basic.convolution import Conv2d
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


class DisentangledNonLocal2d(nn.Module):
    """mmseg ``DisentangledNonLocal2d``: whitened pairwise + unary terms.

    Layout mirrors ``models/utils/non_local.py`` (NHWC, einsum attention);
    the residual branch is ``x + conv_out(y + unary)``.
    """

    in_channels: int
    reduction: int = 2
    use_scale: bool = True
    mode: str = "embedded_gaussian"
    temperature: float = 0.05
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    zeros_init: bool = True
    trainable: bool = True

    def setup(self):
        if self.mode not in ("embedded_gaussian", "dot_product"):
            raise ValueError(
                f"DisentangledNonLocal2d mode {self.mode!r} unsupported")
        self.inter_channels = max(self.in_channels // self.reduction, 1)
        kw = dict(trainable=self.trainable)
        self.g = Conv2d(self.in_channels, self.inter_channels, 1, **kw)
        self.theta = Conv2d(self.in_channels, self.inter_channels, 1, **kw)
        self.phi = Conv2d(self.in_channels, self.inter_channels, 1, **kw)
        self.conv_mask = Conv2d(self.in_channels, 1, 1, **kw)
        out_init = (normal_(0.0, 1e-10) if self.zeros_init
                    else normal_(0.0, 0.01))
        self.conv_out = ConvModule(
            self.inter_channels, self.in_channels, 1,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg, act_cfg=None,
            trainable=self.trainable) if self.norm_cfg is not None else \
            Conv2d(self.inter_channels, self.in_channels, 1,
                   weight_init=out_init, **kw)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        N, H, W, C = x.shape
        L = H * W
        ci = self.inter_channels
        g = self.g(x).reshape(N, L, ci)
        theta = self.theta(x).reshape(N, L, ci)
        phi = self.phi(x).reshape(N, L, ci)

        # Disentangling: subtract the spatial mean (whitened dot product).
        theta = theta - jnp.mean(theta, axis=1, keepdims=True)
        phi = phi - jnp.mean(phi, axis=1, keepdims=True)

        pairwise = jnp.einsum("nlc,nsc->nls", theta, phi,
                              preferred_element_type=jnp.float32)
        if self.mode == "embedded_gaussian":
            if self.use_scale:
                pairwise = pairwise / jnp.sqrt(jnp.float32(ci))
            pairwise = nn.softmax(pairwise / jnp.float32(self.temperature),
                                  axis=-1)
        else:  # dot_product (inherited NonLocal2d semantics: 1/L)
            pairwise = pairwise / jnp.float32(L)
        y = jnp.einsum("nls,nsc->nlc", pairwise.astype(g.dtype), g)
        y = y.reshape(N, H, W, ci)

        # Unary term: softmax saliency over positions pools g globally.
        unary = self.conv_mask(x).reshape(N, L, 1)
        unary = nn.softmax(unary.astype(jnp.float32), axis=1)
        unary_x = jnp.einsum("nlo,nlc->noc", unary.astype(g.dtype), g)
        unary_x = unary_x.reshape(N, 1, 1, ci)

        y = y + unary_x
        if isinstance(self.conv_out, ConvModule):
            y = self.conv_out(y, train=train)
        else:
            y = self.conv_out(y)
        return x + y


@DECODEHEAD.register()
class DNLHead(BaseDecodeHead):
    """FCN-style head with a DNL block between the two 3x3 convs
    (mmseg ``DNLHead``: FCNHead(num_convs=2) + dnl_block)."""

    reduction: int = 2
    use_scale: bool = True
    mode: str = "embedded_gaussian"
    temperature: float = 0.05
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
        self.dnl_block = DisentangledNonLocal2d(
            self.channels, reduction=self.reduction, use_scale=self.use_scale,
            mode=self.mode, temperature=self.temperature,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg)
        if self.concat_input:
            self.conv_cat = ConvModule(
                self.fused_in_channels + self.channels, self.channels, 3,
                padding=1, conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        out = self.convs[0](x, train=train)
        out = self.dnl_block(out, train=train)
        out = self.convs[1](out, train=train)
        if self.concat_input:
            out = self.conv_cat(jnp.concatenate([x, out], axis=-1),
                                train=train)
        return self.cls_seg(out, train=train)
