"""ConvNeXt backbone ("A ConvNet for the 2020s", Liu et al., CVPR 2022).

Beyond-reference addition (the reference lab `/root/reference` ships
ResNet/HRNet/MobileNet/ICNet only): the modernized-ResNet family that
pairs with UPerHead for segmentation.  The architecture is unusually
TPU-friendly as published — this is close to a direct NHWC transcription:

* every LayerNorm is channels-last over the final axis, which is exactly
  this framework's native layout (torch implementations need permutes or a
  custom channels-first LN; here it is the plain ``LayerNorm``);
* the block is one 7x7 depthwise conv (VPU) followed by two pointwise
  convs (MXU matmuls over the 128-lane channel axis) with an exact GELU
  between — no attention, no pooling, static shapes everywhere;
* layer scale (``gamma``, init 1e-6) is a per-channel multiply fused by
  XLA into the preceding matmul's epilogue.

Block: ``x + DropPath(gamma * pw2(gelu(pw1(LN(dw7x7(x))))))``; stem is a
4x4/s4 conv + LN; stage transitions are LN + 2x2/s2 conv; each emitted
feature map gets its own LayerNorm (the mmseg-style segmentation contract).
``with_cp`` maps to ``nn.remat`` per block; ``frozen_stages`` routes the
stem and the first k stages into ``frozen_params`` (CLAUDE.md freeze
convention).

Arch table: tiny (3,3,9,3)x(96,192,384,768) · small (3,3,27,3) same dims ·
base (3,3,27,3)x(128,256,512,1024) · large (3,3,27,3)x(192,384,768,1536) ·
xlarge (3,3,27,3)x(256,512,1024,2048).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_, trunc_normal_
from ...core.registry_hub import BACKBONE
from ..basic.convolution import Conv2d
from ..basic.drop import DropPath
from ..basic.normalization import LayerNorm
from ..basic.param_utils import create_param

_W_INIT = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)

ARCH_TABLE = {
    "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "xlarge": dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048)),
}


class ConvNeXtBlock(nn.Module):
    """dw7x7 → LN → pw(4·dim) → GELU → pw(dim) → gamma → residual+DropPath."""

    dim: int
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        shortcut = x
        x = Conv2d(self.dim, self.dim, 7, padding=3, groups=self.dim,
                   trainable=self.trainable, weight_init=_W_INIT,
                   bias_init=_ZEROS, name="dwconv")(x)
        x = LayerNorm(self.dim, trainable=self.trainable, name="norm")(x)
        x = Conv2d(self.dim, 4 * self.dim, 1, trainable=self.trainable,
                   weight_init=_W_INIT, bias_init=_ZEROS, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is exact
        x = Conv2d(4 * self.dim, self.dim, 1, trainable=self.trainable,
                   weight_init=_W_INIT, bias_init=_ZEROS, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = create_param(
                self, "gamma", constant_(self.layer_scale_init_value),
                (self.dim,), self.trainable)
            x = x * gamma
        return shortcut + DropPath(self.drop_path_rate,
                                   name="drop_path")(x, train=train)


@BACKBONE.register()
class ConvNeXt(nn.Module):
    arch: str = "tiny"
    in_channels: int = 3
    depths: Optional[Sequence[int]] = None   # override the arch table
    dims: Optional[Sequence[int]] = None
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    frozen_stages: int = -1       # freeze stem + stages [0, k): -1 = none
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        if self.arch not in ARCH_TABLE and (self.depths is None
                                            or self.dims is None):
            raise KeyError(f"unknown ConvNeXt arch {self.arch!r}; choose "
                           f"from {sorted(ARCH_TABLE)} or pass depths+dims")
        table = ARCH_TABLE.get(self.arch, {})
        depths = tuple(self.depths or table["depths"])
        dims = tuple(self.dims or table["dims"])
        assert len(depths) == len(dims)
        assert max(self.out_indices) < len(depths)
        if self.frozen_stages not in range(-1, len(depths) + 1):
            raise ValueError(
                f"frozen_stages must be in range(-1, {len(depths) + 1}), "
                f"got {self.frozen_stages}")
        self.stage_depths, self.stage_dims = depths, dims

        total = sum(depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        block_cls = (nn.remat(ConvNeXtBlock, static_argnums=(2,))
                     if self.with_cp else ConvNeXtBlock)

        downsamples, stages, out_norms = [], [], {}
        cur, in_ch = 0, self.in_channels
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            # stage 0's stem counts as its downsample (frozen together)
            trainable = i >= self.frozen_stages
            if i == 0:
                downsamples.append((
                    Conv2d(in_ch, dim, 4, stride=4, trainable=trainable,
                           weight_init=_W_INIT, bias_init=_ZEROS,
                           name="stem_conv"),
                    LayerNorm(dim, trainable=trainable, name="stem_norm"),
                ))
            else:
                downsamples.append((
                    LayerNorm(in_ch, trainable=trainable,
                              name=f"downsample{i}_norm"),
                    Conv2d(in_ch, dim, 2, stride=2, trainable=trainable,
                           weight_init=_W_INIT, bias_init=_ZEROS,
                           name=f"downsample{i}_conv"),
                ))
            stages.append([
                block_cls(dim, drop_path_rate=dpr[cur + j],
                          layer_scale_init_value=self.layer_scale_init_value,
                          trainable=trainable,
                          name=f"stage{i}_block{j}")
                for j in range(depth)
            ])
            if i in self.out_indices:
                out_norms[i] = LayerNorm(dim, trainable=trainable,
                                         name=f"norm{i}")
            cur += depth
            in_ch = dim
        self.downsample_layers = downsamples
        self.stages = stages
        self.out_norms = out_norms

    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(len(self.stage_depths)):
            first, second = self.downsample_layers[i]  # (conv, LN) for the
            x = second(first(x))                       # stem; (LN, conv) after
            for block in self.stages[i]:
                x = block(x, train)
            if i in self.out_indices:
                outs.append(self.out_norms[i](x))
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
