"""Interlaced Sparse Self-Attention decode head (ISANet — Huang et al.,
arXiv 2019; mmseg ``ISAHead`` structure).

Beyond-reference family.  Full self-attention factorized into two small
dense attentions by interlacing: partition the map into a
``(glb_h x glb_w)`` grid of ``(loc_h x loc_w)`` cells, then

* **global relation**: attention among the cells' same-offset pixels
  (each of the loc_h*loc_w offsets forms a batch item of glb_h*glb_w
  long-range samples);
* **local relation**: attention within each cell.

Cost drops from O((HW)^2) to O(HW (glb + loc)) and every regrouping is
a pure reshape/transpose — exactly the layout dance Swin's windowing
already showed maps well to TPU; the attentions themselves ride the
shared ``SelfAttentionBlock`` as batched MXU einsums.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

from ...core.registry_hub import DECODEHEAD
from ..common.conv_module import ConvModule
from ..utils.self_attention_block import SelfAttentionBlock
from .decode_head import BaseDecodeHead


def _isa_attention(channels: int, isa_channels: int, conv_cfg, norm_cfg,
                   act_cfg):
    return SelfAttentionBlock(
        key_in_channels=channels, query_in_channels=channels,
        channels=isa_channels, out_channels=channels,
        share_key_query=False, key_query_num_convs=2, key_query_norm=True,
        value_out_num_convs=1, value_out_norm=False, matmul_norm=True,
        with_out=False, conv_cfg=conv_cfg, norm_cfg=norm_cfg,
        act_cfg=act_cfg)


@DECODEHEAD.register()
class ISAHead(BaseDecodeHead):
    isa_channels: int = 256
    down_factor: Tuple[int, int] = (8, 8)

    def setup(self):
        super().setup()
        self.in_conv = ConvModule(
            self.fused_in_channels, self.channels, 3, padding=1,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg())
        self.global_relation = _isa_attention(
            self.channels, self.isa_channels, self.conv_cfg, self.norm_cfg,
            self._act_cfg())
        self.local_relation = _isa_attention(
            self.channels, self.isa_channels, self.conv_cfg, self.norm_cfg,
            self._act_cfg())
        self.out_conv = ConvModule(
            self.channels * 2, self.channels, 1, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        x = self.in_conv(x, train=train)
        residual = x

        N, H, W, C = x.shape
        loc_h, loc_w = self.down_factor
        glb_h, glb_w = math.ceil(H / loc_h), math.ceil(W / loc_w)
        pad_h, pad_w = glb_h * loc_h - H, glb_w * loc_w - W
        if pad_h or pad_w:  # symmetric pad (original's F.pad split)
            x = jnp.pad(x, ((0, 0),
                            (pad_h // 2, pad_h - pad_h // 2),
                            (pad_w // 2, pad_w - pad_w // 2), (0, 0)))

        # global relation over same-offset samples across cells
        x = x.reshape(N, glb_h, loc_h, glb_w, loc_w, C)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            N * loc_h * loc_w, glb_h, glb_w, C)
        x = self.global_relation(x, x, train=train)

        # local relation within each cell
        x = x.reshape(N, loc_h, loc_w, glb_h, glb_w, C)
        x = x.transpose(0, 3, 4, 1, 2, 5).reshape(
            N * glb_h * glb_w, loc_h, loc_w, C)
        x = self.local_relation(x, x, train=train)

        # restore (N, H, W, C) and crop the pad
        x = x.reshape(N, glb_h, glb_w, loc_h, loc_w, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            N, glb_h * loc_h, glb_w * loc_w, C)
        if pad_h or pad_w:
            x = x[:, pad_h // 2:pad_h // 2 + H, pad_w // 2:pad_w // 2 + W]

        out = self.out_conv(jnp.concatenate([x, residual], axis=-1),
                            train=train)
        return self.cls_seg(out, train=train)
