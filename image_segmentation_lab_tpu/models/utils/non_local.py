"""NonLocal2d block (Wang et al., CVPR 2018) — mmcv ``NonLocal2d``
semantics, NHWC/TPU-native.

Beyond-reference building block for NLHead/GC-style context heads: the
pairwise pixel-affinity attention is two batched MXU einsums over the
flattened spatial axis — exactly the attention shape the TPU tiles best
(L = H*W on sublanes, channels on lanes, f32 softmax accumulation) — so
no dedicated kernel is needed at head resolutions (1/8 scale: L ≈ 6400
at 640² input).

Modes (mmcv parity):
* ``embedded_gaussian`` (default): softmax over theta·phi^T, optionally
  scaled by d^-1/2 (``use_scale``);
* ``dot_product``: plain product averaged by N (1/L normalization);
* ``gaussian``/``concatenation`` are not used by any mmseg config and
  are rejected loudly.

``sub_sample`` applies the paper's 2x2 max-pool shrink on phi/g.
theta/phi/g are bare 1x1 convs; ``conv_out`` carries the norm; the
block is residual (z = x + conv_out(y)).  ``zeros_init`` zeroes the
residual branch via the conv weight when there is no norm (mmcv zeroes
the norm's gamma instead when one exists — here the norm keeps its
standard init; divergence documented, gradient flow is unaffected).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import normal_
from ..basic.convolution import Conv2d
from ..common.conv_module import ConvModule
from ...ops.pooling import max_pool2d


class NonLocal2d(nn.Module):
    in_channels: int
    reduction: int = 2
    use_scale: bool = True
    mode: str = "embedded_gaussian"
    sub_sample: bool = False
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    zeros_init: bool = True          # mmcv: conv_out init to zero
    trainable: bool = True

    def setup(self):
        if self.mode not in ("embedded_gaussian", "dot_product"):
            raise ValueError(
                f"NonLocal2d mode {self.mode!r} unsupported (reference "
                "configs only use embedded_gaussian/dot_product)")
        self.inter_channels = max(self.in_channels // self.reduction, 1)
        kw = dict(trainable=self.trainable)
        self.g = Conv2d(self.in_channels, self.inter_channels, 1, **kw)
        self.theta = Conv2d(self.in_channels, self.inter_channels, 1, **kw)
        self.phi = Conv2d(self.in_channels, self.inter_channels, 1, **kw)
        # mmcv: the residual branch starts at zero (normal(0) == zeros for
        # the weight, zero bias via norm) when zeros_init, else std 0.01
        out_init = (normal_(0.0, 1e-10) if self.zeros_init
                    else normal_(0.0, 0.01))
        norm_cfg = self.norm_cfg
        self.conv_out = ConvModule(
            self.inter_channels, self.in_channels, 1,
            conv_cfg=self.conv_cfg, norm_cfg=norm_cfg, act_cfg=None,
            trainable=self.trainable) if norm_cfg is not None else Conv2d(
            self.inter_channels, self.in_channels, 1, weight_init=out_init,
            **kw)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        N, H, W, C = x.shape
        ci = self.inter_channels
        theta = self.theta(x).reshape(N, H * W, ci)
        kv_in = x
        if self.sub_sample:
            kv_in = max_pool2d(x, 2, 2)
        phi = self.phi(kv_in)
        g = self.g(kv_in)
        S = phi.shape[1] * phi.shape[2]
        phi = phi.reshape(N, S, ci)
        g = g.reshape(N, S, ci)

        pairwise = jnp.einsum("nlc,nsc->nls", theta, phi,
                              preferred_element_type=jnp.float32)
        if self.mode == "embedded_gaussian":
            if self.use_scale:
                pairwise = pairwise / jnp.sqrt(jnp.float32(ci))
            pairwise = nn.softmax(pairwise, axis=-1)
        else:  # dot_product
            pairwise = pairwise / jnp.float32(S)
        y = jnp.einsum("nls,nsc->nlc", pairwise.astype(g.dtype), g)
        y = y.reshape(N, H, W, ci)
        if isinstance(self.conv_out, ConvModule):
            y = self.conv_out(y, train=train)
        else:
            y = self.conv_out(y)
        return x + y
