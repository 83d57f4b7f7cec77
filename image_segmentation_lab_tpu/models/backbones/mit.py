"""MixVisionTransformer (MiT) backbone — the SegFormer encoder family.

Beyond-reference addition: the reference lab (`/root/reference`) ships only
convolutional backbones; this module adds the transformer family from
"SegFormer: Simple and Efficient Design for Semantic Segmentation with
Transformers" (Xie et al., NeurIPS 2021), re-derived for TPU:

* **Attention is pure MXU work.**  Features stay NHWC end-to-end; every
  projection is a 1x1 conv (identical math to a Linear over channels, but
  keeps the channel axis on the 128-lane dimension with no transposes) and
  the attention itself is two batched einsums — QK^T and PV — that XLA
  tiles straight onto the systolic array.
* **Efficient (spatially-reduced) attention**: keys/values are produced
  from a stride-``sr`` conv + LayerNorm, shrinking S by sr² so the
  (L x S) score matrix stays small at segmentation resolutions (stage 1 at
  640² input: L=25600, S=400).
* **f32 softmax** over bf16 matmuls: scores accumulate in f32
  (``preferred_element_type``), the softmax runs in f32, and the result is
  cast back to the compute dtype for the PV matmul — the standard
  mixed-precision attention recipe.
* **Mix-FFN** carries the positional signal as a 3x3 depthwise conv
  between the two pointwise convs (the paper's replacement for positional
  encodings), so the backbone is resolution-agnostic under jit: every
  shape is static per trace and there is no learned position table to
  interpolate.
* ``with_cp`` maps to ``nn.remat`` per encoder layer; ``frozen_stages``
  routes parameters of the first k stages (patch embed + layers + stage
  norm) into the ``frozen_params`` collection, matching the framework's
  freeze convention (see resnet.py / CLAUDE.md).

Arch table (embed_dims x num_heads per stage, paper Table 1 / mmseg
MixVisionTransformer semantics): B0 = embed_dims 32, depths (2,2,2,2);
B1 = 64, (2,2,2,2); B2 = 64, (3,4,6,3); B3 = 64, (3,4,18,3);
B4 = 64, (3,8,27,3); B5 = 64, (3,6,40,3).  Heads (1,2,5,8), SR (8,4,2,1),
MLP ratio 4 for all variants.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import (constant_, kaiming_,
                                               trunc_normal_)
from ...core.registry_hub import BACKBONE
from ...ops.attention import multihead_attention
from ..basic.convolution import Conv2d
from ..basic.drop import Dropout, DropPath
from ..basic.normalization import LayerNorm

# the "linear-role" 1x1 projections use the transformer-standard init
# (trunc normal 0.02, zero bias); real convs (patch embed, sr, depthwise
# positional conv) use kaiming fan_out normal — torch Conv2d-family default
_LINEAR_W = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)
_CONV_W = kaiming_(0.0, "fan_out", "relu", "normal")


class EfficientMultiheadAttention(nn.Module):
    """Spatially-reduced multi-head self-attention on an NHWC map."""

    embed_dims: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        N, H, W, C = x.shape
        h, d = self.num_heads, self.embed_dims // self.num_heads
        assert h * d == C, (C, h)

        q = Conv2d(C, C, 1, bias=self.qkv_bias, trainable=self.trainable,
                   weight_init=_LINEAR_W, bias_init=_ZEROS, name="q")(x)
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = Conv2d(C, C, 1 * self.sr_ratio, stride=self.sr_ratio,
                           trainable=self.trainable, weight_init=_CONV_W,
                           bias_init=_ZEROS, name="sr")(kv_in)
            kv_in = LayerNorm(C, trainable=self.trainable,
                              name="sr_norm")(kv_in)
        kv = Conv2d(C, 2 * C, 1, bias=self.qkv_bias, trainable=self.trainable,
                    weight_init=_LINEAR_W, bias_init=_ZEROS, name="kv")(kv_in)

        L = H * W
        S = kv_in.shape[1] * kv_in.shape[2]
        q = q.reshape(N, L, h, d)
        k = kv[..., :C].reshape(N, S, h, d)
        v = kv[..., C:].reshape(N, S, h, d)

        if self.attn_drop_rate > 0.0 and train:
            # probability dropout forces the materialized-score path;
            # QK^T accumulates in f32 on the MXU, softmax stays f32
            scores = jnp.einsum("nlhd,nshd->nhls", q, k,
                                preferred_element_type=jnp.float32)
            attn = nn.softmax(scores * (1.0 / math.sqrt(d)), axis=-1)
            attn = Dropout(self.attn_drop_rate, name="attn_drop")(
                attn, train=train)
            out = jnp.einsum("nhls,nshd->nlhd", attn.astype(v.dtype), v)
        else:
            # fused flash kernel on TPU in its winning regime, XLA
            # einsums otherwise (ops/attention.py); same f32-softmax
            # numerics contract either way
            out = multihead_attention(q, k, v, 1.0 / math.sqrt(d),
                                      train=train)
        out = out.reshape(N, H, W, C)
        out = Conv2d(C, C, 1, trainable=self.trainable, weight_init=_LINEAR_W,
                     bias_init=_ZEROS, name="proj")(out)
        return Dropout(self.proj_drop_rate, name="proj_drop")(
            out, train=train)


class MixFFN(nn.Module):
    """fc1 -> 3x3 depthwise (positional) conv -> GELU -> fc2, all NHWC."""

    embed_dims: int
    feedforward_channels: int
    drop_rate: float = 0.0
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        C, Ch = self.embed_dims, self.feedforward_channels
        x = Conv2d(C, Ch, 1, trainable=self.trainable, weight_init=_LINEAR_W,
                   bias_init=_ZEROS, name="fc1")(x)
        x = Conv2d(Ch, Ch, 3, padding=1, groups=Ch, trainable=self.trainable,
                   weight_init=_CONV_W, bias_init=_ZEROS, name="pe_conv")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is exact
        x = Dropout(self.drop_rate, name="drop1")(x, train=train)
        x = Conv2d(Ch, C, 1, trainable=self.trainable, weight_init=_LINEAR_W,
                   bias_init=_ZEROS, name="fc2")(x)
        return Dropout(self.drop_rate, name="drop2")(x, train=train)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm block: x += DropPath(Attn(LN x)); x += DropPath(FFN(LN x))."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = LayerNorm(self.embed_dims, trainable=self.trainable,
                      name="norm1")(x)
        y = EfficientMultiheadAttention(
            self.embed_dims, self.num_heads, sr_ratio=self.sr_ratio,
            qkv_bias=self.qkv_bias, attn_drop_rate=self.attn_drop_rate,
            proj_drop_rate=self.drop_rate, trainable=self.trainable,
            name="attn")(y, train=train)
        x = x + DropPath(self.drop_path_rate, name="drop_path1")(
            y, train=train)
        y = LayerNorm(self.embed_dims, trainable=self.trainable,
                      name="norm2")(x)
        y = MixFFN(self.embed_dims, self.feedforward_channels,
                   drop_rate=self.drop_rate, trainable=self.trainable,
                   name="ffn")(y, train=train)
        return x + DropPath(self.drop_path_rate, name="drop_path2")(
            y, train=train)


@BACKBONE.register("MixVisionTransformer", aliases=("MiT",))
class MixVisionTransformer(nn.Module):
    in_channels: int = 3
    embed_dims: int = 32          # base width; stage i width = this * heads[i]
    num_stages: int = 4
    num_layers: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    mlp_ratio: int = 4
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    frozen_stages: int = -1       # freeze stages [0, k): -1 = none
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        assert self.num_stages == len(self.num_layers) == len(self.num_heads) \
            == len(self.patch_sizes) == len(self.strides) \
            == len(self.sr_ratios)
        assert max(self.out_indices) < self.num_stages
        if self.frozen_stages not in range(-1, self.num_stages + 1):
            raise ValueError(
                f"frozen_stages must be in range(-1, {self.num_stages + 1}), "
                f"got {self.frozen_stages}")

        # stochastic depth decays linearly over the total block count
        total = sum(self.num_layers)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]

        layer_cls = (nn.remat(TransformerEncoderLayer,
                              static_argnums=(2,))
                     if self.with_cp else TransformerEncoderLayer)

        in_ch = self.in_channels
        embeds, stages, norms = [], [], []
        cur = 0
        for i in range(self.num_stages):
            trainable = i >= self.frozen_stages
            dims = self.embed_dims * self.num_heads[i]
            embeds.append((
                Conv2d(in_ch, dims, self.patch_sizes[i],
                       stride=self.strides[i],
                       padding=self.patch_sizes[i] // 2, trainable=trainable,
                       weight_init=_CONV_W, bias_init=_ZEROS,
                       name=f"patch_embed{i + 1}_proj"),
                LayerNorm(dims, trainable=trainable,
                          name=f"patch_embed{i + 1}_norm"),
            ))
            stages.append([
                layer_cls(dims, self.num_heads[i],
                          feedforward_channels=self.mlp_ratio * dims,
                          sr_ratio=self.sr_ratios[i],
                          qkv_bias=self.qkv_bias,
                          drop_rate=self.drop_rate,
                          attn_drop_rate=self.attn_drop_rate,
                          drop_path_rate=dpr[cur + j],
                          trainable=trainable,
                          name=f"stage{i + 1}_block{j + 1}")
                for j in range(self.num_layers[i])
            ])
            norms.append(LayerNorm(dims, trainable=trainable,
                                   name=f"norm{i + 1}"))
            cur += self.num_layers[i]
            in_ch = dims
        self.patch_embeds = embeds
        self.stages = stages
        self.stage_norms = norms

    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(self.num_stages):
            proj, embed_norm = self.patch_embeds[i]
            x = embed_norm(proj(x, train=train))
            for block in self.stages[i]:
                x = block(x, train)
            x = self.stage_norms[i](x)
            if i in self.out_indices:
                outs.append(x)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
