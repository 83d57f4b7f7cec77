"""Twins backbones — PCPVT and SVT (Chu et al., NeurIPS 2021; mmseg
``PCPVT``/``SVT`` semantics).

Beyond-reference transformer families.  PCPVT is PVT with conditional
position encoding: overlap-free patch embeds, global subsampled
attention (the same spatially-reduced attention MiT uses —
``mit.EfficientMultiheadAttention`` is reused directly), a plain
linear FFN, and a depthwise-conv PEG inserted after each stage's first
block.  SVT alternates locally-grouped window attention (LSA — padded
``ws x ws`` groups as pure reshapes with a pad mask, no shifting) with
the same GSA layers.  All attention is batched MXU einsums with f32
softmax; windows/groups are static reshapes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_, trunc_normal_
from ...core.registry_hub import BACKBONE
from ..basic.convolution import Conv2d, Linear
from ..basic.drop import Dropout, DropPath
from ..basic.normalization import LayerNorm
from .mit import EfficientMultiheadAttention

_W_INIT = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)

ARCH_TABLE = {
    # (embed_dims, depths, num_heads, mlp_ratios, sr_ratios, wss)
    "pcpvt-small": dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3),
                        heads=(1, 2, 5, 8), mlps=(8, 8, 4, 4),
                        srs=(8, 4, 2, 1), wss=None),
    "pcpvt-base": dict(dims=(64, 128, 320, 512), depths=(3, 4, 18, 3),
                       heads=(1, 2, 5, 8), mlps=(8, 8, 4, 4),
                       srs=(8, 4, 2, 1), wss=None),
    "pcpvt-large": dict(dims=(64, 128, 320, 512), depths=(3, 8, 27, 3),
                        heads=(1, 2, 5, 8), mlps=(8, 8, 4, 4),
                        srs=(8, 4, 2, 1), wss=None),
    "svt-small": dict(dims=(64, 128, 256, 512), depths=(2, 2, 10, 4),
                      heads=(2, 4, 8, 16), mlps=(4, 4, 4, 4),
                      srs=(8, 4, 2, 1), wss=(7, 7, 7, 7)),
    "svt-base": dict(dims=(96, 192, 384, 768), depths=(2, 2, 18, 2),
                     heads=(3, 6, 12, 24), mlps=(4, 4, 4, 4),
                     srs=(8, 4, 2, 1), wss=(7, 7, 7, 7)),
    "svt-large": dict(dims=(128, 256, 512, 1024), depths=(2, 2, 18, 2),
                      heads=(4, 8, 16, 32), mlps=(4, 4, 4, 4),
                      srs=(8, 4, 2, 1), wss=(7, 7, 7, 7)),
}


class ConditionalPositionEncoding(nn.Module):
    """PEG: residual depthwise 3x3 (Chu et al., CPVT)."""

    embed_dims: int
    stride: int = 1
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = self.embed_dims
        y = Conv2d(C, C, 3, stride=self.stride, padding=1, groups=C,
                   trainable=self.trainable, name="proj")(x)
        return y + x if self.stride == 1 else y


class TwinsFFN(nn.Module):
    """mmcv FFN: Linear → GELU → drop → Linear → drop (no conv)."""

    embed_dims: int
    feedforward_channels: int
    drop_rate: float = 0.0
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        C, Ch = self.embed_dims, self.feedforward_channels
        x = Linear(C, Ch, trainable=self.trainable, weight_init=_W_INIT,
                   bias_init=_ZEROS, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = Dropout(self.drop_rate, name="drop1")(x, train=train)
        x = Linear(Ch, C, trainable=self.trainable, weight_init=_W_INIT,
                   bias_init=_ZEROS, name="fc2")(x)
        return Dropout(self.drop_rate, name="drop2")(x, train=train)


class LocallyGroupedSelfAttention(nn.Module):
    """LSA: full attention inside padded ws x ws groups (no shift)."""

    embed_dims: int
    num_heads: int
    window_size: int = 7
    qkv_bias: bool = True
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        N, H, W, C = x.shape
        ws = self.window_size
        h, d = self.num_heads, self.embed_dims // self.num_heads
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        nh, nw = Hp // ws, Wp // ws
        G, P = nh * nw, ws * ws

        g = xp.reshape(N, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5) \
              .reshape(N, G, P, C)
        qkv = Linear(C, 3 * C, bias=self.qkv_bias, trainable=self.trainable,
                     weight_init=_W_INIT, bias_init=_ZEROS, name="qkv")(g)
        q, k, v = jnp.split(qkv.reshape(N, G, P, 3, h, d), 3, axis=3)
        q, k, v = q[:, :, :, 0], k[:, :, :, 0], v[:, :, :, 0]

        scores = jnp.einsum("ngphd,ngshd->nghps", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / np.sqrt(d))
        if pad_b or pad_r:
            # pairwise pad-indicator difference (the upstream mask trick):
            # valid↔padded pairs get -1000, like-with-like stays 0
            pad = np.zeros((Hp, Wp), np.float32)
            if pad_b:
                pad[-pad_b:, :] = 1.0
            if pad_r:
                pad[:, -pad_r:] = 1.0
            pad = pad.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3) \
                     .reshape(G, P)
            mask = pad[:, :, None] - pad[:, None, :]
            mask = np.where(mask != 0.0, -1000.0, 0.0).astype(np.float32)
            scores = scores + jnp.asarray(mask)[None, :, None]
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("nghps,ngshd->ngphd", attn.astype(v.dtype), v)
        out = out.reshape(N, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5) \
                 .reshape(N, Hp, Wp, C)[:, :H, :W]
        return Linear(C, C, trainable=self.trainable, weight_init=_W_INIT,
                      bias_init=_ZEROS, name="proj")(out)


class GSAEncoderLayer(nn.Module):
    """norm → GSA (sr attention) → norm → FFN, pre-norm residuals."""

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
    def __call__(self, x, train: bool = False):
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
        y = TwinsFFN(self.embed_dims, self.feedforward_channels,
                     drop_rate=self.drop_rate, trainable=self.trainable,
                     name="ffn")(y, train=train)
        return x + DropPath(self.drop_path_rate, name="drop_path2")(
            y, train=train)


class LSAEncoderLayer(nn.Module):
    """norm → LSA (window attention) → norm → FFN."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int
    window_size: int = 7
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    trainable: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = LayerNorm(self.embed_dims, trainable=self.trainable,
                      name="norm1")(x)
        y = LocallyGroupedSelfAttention(
            self.embed_dims, self.num_heads, self.window_size,
            qkv_bias=self.qkv_bias, trainable=self.trainable,
            name="attn")(y, train=train)
        x = x + DropPath(self.drop_path_rate, name="drop_path1")(
            y, train=train)
        y = LayerNorm(self.embed_dims, trainable=self.trainable,
                      name="norm2")(x)
        y = TwinsFFN(self.embed_dims, self.feedforward_channels,
                     drop_rate=self.drop_rate, trainable=self.trainable,
                     name="ffn")(y, train=train)
        return x + DropPath(self.drop_path_rate, name="drop_path2")(
            y, train=train)


@BACKBONE.register("PCPVT", aliases=("Twins-PCPVT",))
class PCPVT(nn.Module):
    """mmseg ``PCPVT``: GSA stages with PEG after each stage's first
    block.  Subclassed by ``SVT`` (alternating LSA/GSA)."""

    arch: str = "pcpvt-small"
    in_channels: int = 3
    out_indices: Sequence[int] = (0, 1, 2, 3)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_after_stage: bool = False
    frozen_stages: int = -1
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def _block(self, stage, j, table, dpr, trainable):
        dims, heads = table["dims"][stage], table["heads"][stage]
        ffc = table["mlps"][stage] * dims
        return GSAEncoderLayer(
            dims, heads, ffc, sr_ratio=table["srs"][stage],
            qkv_bias=self.qkv_bias, drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate, drop_path_rate=dpr,
            trainable=trainable, name=f"stage{stage}_block{j}")

    def setup(self):
        if self.arch not in ARCH_TABLE:
            raise KeyError(f"unknown Twins arch {self.arch!r}; choose "
                           f"from {sorted(ARCH_TABLE)}")
        table = ARCH_TABLE[self.arch]
        dims, depths = table["dims"], table["depths"]
        self.stage_dims, self.stage_depths = dims, depths

        total = sum(depths)
        dprs = [self.drop_path_rate * i / max(total - 1, 1)
                for i in range(total)]

        embeds, norms_in, stages, pegs, out_norms = [], [], [], [], []
        cur, in_ch = 0, self.in_channels
        for i, (dim, depth) in enumerate(zip(dims, depths)):
            trainable = i + 1 > self.frozen_stages
            ps = 4 if i == 0 else 2
            embeds.append(Conv2d(in_ch, dim, ps, stride=ps,
                                 trainable=trainable,
                                 name=f"embed{i}_conv"))
            norms_in.append(LayerNorm(dim, trainable=trainable,
                                      name=f"embed{i}_norm"))
            stages.append([
                self._block(i, j, table, dprs[cur + j], trainable)
                for j in range(depth)
            ])
            pegs.append(ConditionalPositionEncoding(
                dim, trainable=trainable, name=f"peg{i}"))
            if self.norm_after_stage:
                out_norms.append(LayerNorm(dim, trainable=trainable,
                                           name=f"norm_after{i}"))
            cur += depth
            in_ch = dim
        self.patch_embeds = embeds
        self.embed_norms = norms_in
        self.stages = stages
        self.position_encodings = pegs
        self.out_norms = out_norms
        self.pos_drop = Dropout(self.drop_rate, name="pos_drop")

    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(len(self.stage_dims)):
            x = self.embed_norms[i](self.patch_embeds[i](x))
            x = self.pos_drop(x, train=train)
            for j, block in enumerate(self.stages[i]):
                x = block(x, train=train)
                if j == 0:
                    x = self.position_encodings[i](x)
            if self.norm_after_stage:
                x = self.out_norms[i](x)
            if i in self.out_indices:
                outs.append(x)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)


@BACKBONE.register("SVT", aliases=("Twins-SVT",))
class SVT(PCPVT):
    """mmseg ``SVT``: even blocks LSA (window), odd blocks GSA."""

    arch: str = "svt-small"
    norm_after_stage: bool = True

    def _block(self, stage, j, table, dpr, trainable):
        if j % 2 == 0:
            dims, heads = table["dims"][stage], table["heads"][stage]
            return LSAEncoderLayer(
                dims, heads, table["mlps"][stage] * dims,
                window_size=table["wss"][stage], qkv_bias=self.qkv_bias,
                drop_rate=self.drop_rate, drop_path_rate=dpr,
                trainable=trainable, name=f"stage{stage}_block{j}")
        return super()._block(stage, j, table, dpr, trainable)
