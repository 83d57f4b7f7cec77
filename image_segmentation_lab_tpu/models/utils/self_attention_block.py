"""Generic query/key/value self-attention block (mmseg
``models/utils/self_attention_block.py`` semantics) — the shared engine
behind ANN's APNB/AFNB and ISANet's interlaced attention.

NHWC/TPU-native: projections are 1x1 ConvModules (channels stay on the
lane axis), the similarity and context products are batched MXU einsums
with f32 score accumulation, and the optional key/query downsamplers are
arbitrary callables (max-pool, ANN's pyramid-pool-concat) applied before
flattening.  ``matmul_norm`` scales by ``channels**-0.5``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..basic.convolution import Conv2d
from ..common.conv_module import ConvModule


class SelfAttentionBlock(nn.Module):
    key_in_channels: int
    query_in_channels: int
    channels: int
    out_channels: int
    share_key_query: bool = False
    query_downsample: Optional[Callable] = None
    key_downsample: Optional[Callable] = None
    key_query_num_convs: int = 1
    value_out_num_convs: int = 1
    key_query_norm: bool = False
    value_out_norm: bool = False
    matmul_norm: bool = False
    with_out: bool = False
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = None

    def _project(self, in_ch, out_ch, num_convs, use_norm, name):
        convs = []
        for i in range(num_convs):
            ic = in_ch if i == 0 else out_ch
            if use_norm:
                convs.append(ConvModule(
                    ic, out_ch, 1, conv_cfg=self.conv_cfg,
                    norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                    name=f"{name}_{i}"))
            else:
                convs.append(Conv2d(ic, out_ch, 1, name=f"{name}_{i}"))
        return convs

    def setup(self):
        self.query_project = self._project(
            self.query_in_channels, self.channels,
            self.key_query_num_convs, self.key_query_norm, "query_project")
        if self.share_key_query:
            assert self.key_in_channels == self.query_in_channels
            self.key_project = self.query_project
        else:
            self.key_project = self._project(
                self.key_in_channels, self.channels,
                self.key_query_num_convs, self.key_query_norm,
                "key_project")
        self.value_project = self._project(
            self.key_in_channels,
            self.channels if self.with_out else self.out_channels,
            self.value_out_num_convs, self.value_out_norm, "value_project")
        if self.with_out:
            self.out_project = self._project(
                self.channels, self.out_channels,
                self.value_out_num_convs, self.value_out_norm,
                "out_project")
        else:
            self.out_project = None

    @staticmethod
    def _run(convs, x, train):
        for conv in convs:
            x = conv(x, train=train) if isinstance(conv, ConvModule) else \
                conv(x)
        return x

    def __call__(self, query_feats, key_feats, train: bool = False):
        N = query_feats.shape[0]
        query = self._run(self.query_project, query_feats, train)
        if self.query_downsample is not None:
            query = self.query_downsample(query)
        qh, qw = query.shape[1:3]
        query = query.reshape(N, qh * qw, self.channels)

        key = self._run(self.key_project, key_feats, train)
        value = self._run(self.value_project, key_feats, train)
        if self.key_downsample is not None:
            key = self.key_downsample(key)
            value = self.key_downsample(value)
        # downsamplers may return NHWC or pre-flattened (N, S, C)
        key = key.reshape(N, -1, self.channels)
        value = value.reshape(N, -1, value.shape[-1])

        sim = jnp.einsum("nlc,nsc->nls", query, key,
                         preferred_element_type=jnp.float32)
        if self.matmul_norm:
            sim = (self.channels ** -0.5) * sim
        sim = nn.softmax(sim, axis=-1)
        context = jnp.einsum("nls,nsc->nlc", sim.astype(value.dtype), value)
        context = context.reshape(N, qh, qw, -1)
        if self.out_project is not None:
            context = self._run(self.out_project, context, train)
        return context
