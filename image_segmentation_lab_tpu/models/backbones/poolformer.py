"""PoolFormer backbone (Yu et al., CVPR 2022 — "MetaFormer Is Actually
What You Need for Vision"; mmpretrain ``PoolFormer`` structure, the
mmseg FPN-PoolFormer segmentation configs ride it).

Beyond-reference addition.  The MetaFormer ablation backbone: a
transformer-shaped network whose "attention" is a 3x3 average pool —
``token_mixer(x) = avgpool3x3(x) - x`` (count_include_pad=False, the
subtraction makes it a residual-free smoother).  On TPU this is an
ideal shape: the mixer is one VPU reduce_window, the MLP is two 1x1
convs (MXU matmuls on the lane axis), and the norms are GroupNorm(1)
(per-sample global statistics — no running stats, no train/eval split).

Block: ``x += DropPath(ls1 * mixer(GN(x)))`` then
``x += DropPath(ls2 * pw2(GELU(pw1(GN(x)))))`` with layer-scale init
1e-5.  Stem is a 7x7/s4 conv (to 1/4); stage transitions are 3x3/s2
convs; emitted maps get their own GroupNorm(1) (mmpretrain's
out-indices contract).

Arch table (depths x dims, mlp_ratio 4): s12 (2,2,6,2)x(64,128,320,512)
· s24 (4,4,12,4) same dims · s36 (6,6,18,6) same dims · m36
(6,6,18,6)x(96,192,384,768) · m48 (8,8,24,8) same dims.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_, trunc_normal_
from ...core.registry_hub import BACKBONE
from ...ops.pooling import avg_pool2d
from ..basic.convolution import Conv2d
from ..basic.drop import DropPath
from ..basic.normalization import GroupNorm
from ..basic.param_utils import create_param

_W_INIT = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)

ARCH_TABLE = {
    "s12": dict(depths=(2, 2, 6, 2), dims=(64, 128, 320, 512)),
    "s24": dict(depths=(4, 4, 12, 4), dims=(64, 128, 320, 512)),
    "s36": dict(depths=(6, 6, 18, 6), dims=(64, 128, 320, 512)),
    "m36": dict(depths=(6, 6, 18, 6), dims=(96, 192, 384, 768)),
    "m48": dict(depths=(8, 8, 24, 8), dims=(96, 192, 384, 768)),
}


class PoolFormerBlock(nn.Module):
    """GN → (avgpool3x3 − id) → ls1 → +res; GN → MLP → ls2 → +res."""

    dim: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-5
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ls = self.layer_scale_init_value
        h = GroupNorm(1, self.dim, trainable=self.trainable, name="norm1")(x)
        h = avg_pool2d(h, 3, 1, padding=1, count_include_pad=False) - h
        if ls > 0:
            h = h * create_param(self, "layer_scale_1", constant_(ls),
                                 (self.dim,), self.trainable)
        x = x + DropPath(self.drop_path_rate, name="drop_path1")(h, train)

        hidden = int(self.dim * self.mlp_ratio)
        h = GroupNorm(1, self.dim, trainable=self.trainable, name="norm2")(x)
        h = Conv2d(self.dim, hidden, 1, trainable=self.trainable,
                   weight_init=_W_INIT, bias_init=_ZEROS, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = Conv2d(hidden, self.dim, 1, trainable=self.trainable,
                   weight_init=_W_INIT, bias_init=_ZEROS, name="fc2")(h)
        if ls > 0:
            h = h * create_param(self, "layer_scale_2", constant_(ls),
                                 (self.dim,), self.trainable)
        return x + DropPath(self.drop_path_rate, name="drop_path2")(h, train)


@BACKBONE.register()
class PoolFormer(nn.Module):
    arch: str = "s12"
    in_channels: int = 3
    depths: Optional[Sequence[int]] = None    # override the arch table
    dims: Optional[Sequence[int]] = None
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-5
    frozen_stages: int = -1
    with_cp: bool = False
    init_cfg: Optional[Any] = None

    def setup(self):
        if self.arch not in ARCH_TABLE and (self.depths is None
                                            or self.dims is None):
            raise KeyError(f"unknown PoolFormer arch {self.arch!r}; choose "
                           f"from {sorted(ARCH_TABLE)} or pass depths+dims")
        table = ARCH_TABLE.get(self.arch, {})
        depths = tuple(self.depths or table["depths"])
        dims = tuple(self.dims or table["dims"])
        assert len(depths) == len(dims)
        assert max(self.out_indices) < len(depths)
        self.stage_depths, self.stage_dims = depths, dims

        total = sum(depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        block_cls = (nn.remat(PoolFormerBlock, static_argnums=(2,))
                     if self.with_cp else PoolFormerBlock)

        embeds, stages, out_norms = [], [], {}
        cur, in_ch = 0, self.in_channels
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            trainable = i >= self.frozen_stages
            if i == 0:
                embeds.append(Conv2d(in_ch, dim, 7, stride=4, padding=2,
                                     trainable=trainable, weight_init=_W_INIT,
                                     bias_init=_ZEROS, name="patch_embed0"))
            else:
                embeds.append(Conv2d(in_ch, dim, 3, stride=2, padding=1,
                                     trainable=trainable, weight_init=_W_INIT,
                                     bias_init=_ZEROS,
                                     name=f"patch_embed{i}"))
            stages.append([
                block_cls(dim, mlp_ratio=self.mlp_ratio,
                          drop_path_rate=dpr[cur + j],
                          layer_scale_init_value=self.layer_scale_init_value,
                          trainable=trainable, name=f"stage{i}_block{j}")
                for j in range(depth)
            ])
            if i in self.out_indices:
                out_norms[i] = GroupNorm(1, dim, trainable=trainable,
                                         name=f"norm{i}")
            cur += depth
            in_ch = dim
        self.patch_embeds = embeds
        self.stages = stages
        self.out_norms = out_norms

    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(len(self.stage_depths)):
            x = self.patch_embeds[i](x)
            for block in self.stages[i]:
                x = block(x, train)
            if i in self.out_indices:
                outs.append(self.out_norms[i](x))
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
