"""Criss-Cross attention decode head (CCNet — Huang et al., ICCV 2019;
mmseg ``CCHead`` semantics), re-derived as axial einsums.

Beyond-reference family.  The reference ecosystem implements criss-cross
attention as a custom CUDA kernel (mmcv ``CrissCrossAttention``); on TPU
no kernel is needed — each pixel attends over its row and its column, so
the affinities factor into two batched MXU einsums with the H (resp. W)
axis as the contraction:

* column energies ``(N, H, W, H')``: queries against keys sharing the
  same column; the self position gets -inf (the paper's INF trick) so
  the center is counted once — it stays in the row energies;
* row energies ``(N, H, W, W')``: queries against keys sharing the row;
* one softmax over the concatenated H+W axis, then the two value
  gathers are the transposed einsums, summed.

Two recurrence steps (``recurrence=2``) give every pixel full-image
context (row+column of row+column) at O(HW(H+W)) cost versus
non-local's O((HW)^2).  gamma starts at 0 (residual identity at init).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_
from ...core.registry_hub import DECODEHEAD
from ..basic.convolution import Conv2d
from ..basic.param_utils import create_param
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead

_NEG_INF = -1e30


class CrissCrossAttention(nn.Module):
    """One criss-cross attention pass (paper Fig. 2)."""

    in_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, H, W, C = x.shape
        cq = max(C // 8, 1)
        q = Conv2d(C, cq, 1, bias=False, name="query")(x)
        k = Conv2d(C, cq, 1, bias=False, name="key")(x)
        v = Conv2d(C, C, 1, bias=False, name="value")(x)

        # column affinities: (n, h, w) x (n, h', w) — contract over cq
        e_h = jnp.einsum("nhwd,nswd->nhws", q, k,
                         preferred_element_type=jnp.float32)  # (N,H,W,H)
        eye = jnp.eye(H, dtype=bool)[:, None, :]               # (H, 1, H)
        e_h = jnp.where(eye, _NEG_INF, e_h)
        # row affinities: (n, h, w) x (n, h, w')
        e_w = jnp.einsum("nhwd,nhsd->nhws", q, k,
                         preferred_element_type=jnp.float32)  # (N,H,W,W)

        attn = nn.softmax(jnp.concatenate([e_h, e_w], axis=-1), axis=-1)
        a_h, a_w = attn[..., :H], attn[..., H:]
        out = (jnp.einsum("nhws,nswc->nhwc", a_h.astype(v.dtype), v)
               + jnp.einsum("nhws,nhsc->nhwc", a_w.astype(v.dtype), v))
        gamma = create_param(self, "gamma", constant_(0.0), (), True)
        return gamma.astype(x.dtype) * out + x


@DECODEHEAD.register()
class CCHead(BaseDecodeHead):
    recurrence: int = 2
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
        self.cca = CrissCrossAttention(self.channels)
        if self.concat_input:
            self.conv_cat = ConvModule(
                self.fused_in_channels + self.channels, self.channels, 3,
                padding=1, conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        out = self.convs[0](x, train=train)
        for _ in range(self.recurrence):  # weight-shared recurrence
            out = self.cca(out)
        out = self.convs[1](out, train=train)
        if self.concat_input:
            out = self.conv_cat(jnp.concatenate([x, out], axis=-1),
                                train=train)
        return self.cls_seg(out, train=train)
