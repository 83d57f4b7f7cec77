"""MSCAN backbone (SegNeXt — Guo et al., NeurIPS 2022; mmseg ``MSCAN``
semantics).

Beyond-reference family.  Multi-Scale Convolutional Attention: each
block gates its input with a sum of strip-shaped depthwise convolutions
(5x5, then 1x7/7x1, 1x11/11x1, 1x21/21x1 pairs) followed by a 1x1 mixer
— attention without softmax or pairwise matmuls.  TPU notes: the strip
convs are depthwise (VPU, full-lane at these widths); everything stays
NHWC so mmseg's token-flatten/reshape round-trips vanish; BN is used
inside blocks exactly as upstream (norm_cfg), with the per-stage
LayerNorm on the channel axis.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_
from ...core.registry_hub import BACKBONE
from ..basic.convolution import Conv2d
from ..basic.drop import DropPath
from ..basic.normalization import LayerNorm
from ..basic.param_utils import create_param
from ..builder import build_norm_layer
from .resnet import _norm_cfg

# (embed_dims, depths); mlp_ratios/kernels are shared across archs
ARCH_TABLE = {
    "tiny": dict(dims=(32, 64, 160, 256), depths=(3, 3, 5, 2),
                 mlp_ratios=(8, 8, 4, 4)),
    "small": dict(dims=(64, 128, 320, 512), depths=(2, 2, 4, 2),
                  mlp_ratios=(8, 8, 4, 4)),
    "base": dict(dims=(64, 128, 320, 512), depths=(3, 3, 12, 3),
                 mlp_ratios=(8, 8, 4, 4)),
    "large": dict(dims=(64, 128, 320, 512), depths=(3, 5, 27, 3),
                  mlp_ratios=(8, 8, 4, 4)),
}

ATTN_KERNELS = ((1, 7), (1, 11), (1, 21))   # + the 5x5 square opener


class MSCAAttention(nn.Module):
    """mmseg ``MSCAAttention``: 5x5 dw + three strip-pair dw + 1x1 mix."""

    channels: int
    trainable: bool = True

    def setup(self):
        C, kw = self.channels, dict(trainable=self.trainable)
        self.conv0 = Conv2d(C, C, 5, padding=2, groups=C, **kw)
        branches = []
        for i, (a, b) in enumerate(ATTN_KERNELS):
            pad = (0, b // 2)
            branches.append((
                Conv2d(C, C, (a, b), padding=pad, groups=C,
                       name=f"conv{i}_1", **kw),
                Conv2d(C, C, (b, a), padding=pad[::-1], groups=C,
                       name=f"conv{i}_2", **kw),
            ))
        self.branches = branches
        self.conv3 = Conv2d(C, C, 1, **kw)

    def __call__(self, x, train: bool = False):
        u = x
        attn = self.conv0(x)
        total = attn
        for c1, c2 in self.branches:
            total = total + c2(c1(attn))
        return self.conv3(total) * u


class MSCASpatialAttention(nn.Module):
    """proj → GELU → MSCA gate → proj, residual (mmseg wrapper)."""

    channels: int
    trainable: bool = True

    def setup(self):
        C, kw = self.channels, dict(trainable=self.trainable)
        self.proj_1 = Conv2d(C, C, 1, **kw)
        self.spatial_gating_unit = MSCAAttention(C,
                                                 trainable=self.trainable)
        self.proj_2 = Conv2d(C, C, 1, **kw)

    def __call__(self, x, train: bool = False):
        shortcut = x
        x = nn.gelu(self.proj_1(x), approximate=False)
        x = self.spatial_gating_unit(x, train=train)
        return self.proj_2(x) + shortcut


class MSCAMlp(nn.Module):
    """1x1 expand → 3x3 depthwise → GELU → 1x1 project."""

    channels: int
    hidden: int
    trainable: bool = True

    def setup(self):
        kw = dict(trainable=self.trainable)
        self.fc1 = Conv2d(self.channels, self.hidden, 1, **kw)
        self.dwconv = Conv2d(self.hidden, self.hidden, 3, padding=1,
                             groups=self.hidden, **kw)
        self.fc2 = Conv2d(self.hidden, self.channels, 1, **kw)

    def __call__(self, x, train: bool = False):
        x = nn.gelu(self.dwconv(self.fc1(x)), approximate=False)
        return self.fc2(x)


class MSCABlock(nn.Module):
    """BN → attention (+scale, +droppath) → BN → MLP (mmseg MSCABlock)."""

    channels: int
    mlp_ratio: int = 4
    drop_path_rate: float = 0.0
    norm_cfg: Optional[Dict] = None
    trainable: bool = True
    norm_force_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ncfg = _norm_cfg(self.norm_cfg or dict(type="BN"), self.trainable,
                         self.norm_force_eval)
        norm1 = build_norm_layer(dict(ncfg, name="norm1"), self.channels,
                                 postfix=1)[1]
        attn = MSCASpatialAttention(self.channels, trainable=self.trainable,
                                    name="attn")
        norm2 = build_norm_layer(dict(ncfg, name="norm2"), self.channels,
                                 postfix=2)[1]
        mlp = MSCAMlp(self.channels, self.channels * self.mlp_ratio,
                      trainable=self.trainable, name="mlp")
        dpath = DropPath(self.drop_path_rate, name="drop_path")
        ls1 = create_param(self, "layer_scale_1", constant_(1e-2),
                           (self.channels,), self.trainable)
        ls2 = create_param(self, "layer_scale_2", constant_(1e-2),
                           (self.channels,), self.trainable)
        x = x + dpath(ls1 * attn(norm1(x, train=train), train=train),
                      train=train)
        x = x + dpath(ls2 * mlp(norm2(x, train=train), train=train),
                      train=train)
        return x


@BACKBONE.register()
class MSCAN(nn.Module):
    """mmseg ``MSCAN``: stem/overlap embeds + MSCA blocks + stage LN."""

    arch: str = "tiny"
    in_channels: int = 3
    embed_dims: Optional[Sequence[int]] = None   # override the arch table
    depths: Optional[Sequence[int]] = None
    mlp_ratios: Optional[Sequence[int]] = None
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    norm_cfg: Optional[Dict] = None
    frozen_stages: int = -1
    norm_eval: bool = False
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        if self.arch not in ARCH_TABLE and (self.embed_dims is None
                                            or self.depths is None):
            raise KeyError(f"unknown MSCAN arch {self.arch!r}; choose from "
                           f"{sorted(ARCH_TABLE)} or pass embed_dims+depths")
        table = ARCH_TABLE.get(self.arch, {})
        dims = tuple(self.embed_dims or table["dims"])
        depths = tuple(self.depths or table["depths"])
        ratios = tuple(self.mlp_ratios or table.get("mlp_ratios",
                                                    (8, 8, 4, 4)))
        assert len(dims) == len(depths) == len(ratios)
        self.stage_dims, self.stage_depths = dims, depths
        norm_cfg = self.norm_cfg or dict(type="SyncBatchNorm",
                                         requires_grad=True)

        total = sum(depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        block_cls = (nn.remat(MSCABlock, static_argnums=(2,))
                     if self.with_cp else MSCABlock)

        embeds, stages, norms = [], [], []
        cur, in_ch = 0, self.in_channels
        for i, (dim, depth, ratio) in enumerate(zip(dims, depths, ratios)):
            trainable = i + 1 > self.frozen_stages
            force_eval = self.norm_eval or not trainable
            ncfg = _norm_cfg(norm_cfg, trainable, force_eval)
            if i == 0:
                # StemConv: two stride-2 3x3 convs with BN + GELU between
                embeds.append((
                    Conv2d(in_ch, dim // 2, 3, stride=2, padding=1,
                           trainable=trainable, name="stem_conv1"),
                    build_norm_layer(ncfg, dim // 2, postfix="stem1")[1],
                    Conv2d(dim // 2, dim, 3, stride=2, padding=1,
                           trainable=trainable, name="stem_conv2"),
                    build_norm_layer(ncfg, dim, postfix="stem2")[1],
                ))
            else:
                embeds.append((
                    Conv2d(in_ch, dim, 3, stride=2, padding=1,
                           trainable=trainable, name=f"embed{i}_conv"),
                    build_norm_layer(ncfg, dim, postfix=f"embed{i}")[1],
                ))
            stages.append([
                block_cls(dim, mlp_ratio=ratio,
                          drop_path_rate=dpr[cur + j], norm_cfg=norm_cfg,
                          trainable=trainable, norm_force_eval=force_eval,
                          name=f"stage{i}_block{j}")
                for j in range(depth)
            ])
            norms.append(LayerNorm(dim, trainable=trainable,
                                   name=f"norm{i}"))
            cur += depth
            in_ch = dim
        self.patch_embeds = embeds
        self.stages = stages
        self.stage_norms = norms

    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(len(self.stage_dims)):
            e = self.patch_embeds[i]
            if i == 0:
                x = nn.gelu(e[1](e[0](x), train=train), approximate=False)
                x = e[3](e[2](x), train=train)
            else:
                x = e[1](e[0](x), train=train)
            for block in self.stages[i]:
                x = block(x, train)
            x = self.stage_norms[i](x)
            if i in self.out_indices:
                outs.append(x)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
