"""MAE backbone (He et al., CVPR 2022 — "Masked Autoencoders Are
Scalable Vision Learners"; mmseg ``MAE`` fine-tune structure, ridden by
UPerNet configs through the ``Feature2Pyramid`` neck like BEiT).

Beyond-reference addition.  MAE fine-tuning reuses the BEiT block
(relative position bias, q/v-only qkv bias, layer scale) with three
differences, which are exactly what this module adds on top of
``models/backbones/beit.py``:

* **Learned absolute position embedding** of shape
  ``(1, num_patches + 1, C)`` added after the cls token is prepended —
  BEiT has none (positions enter only through the per-layer relative
  bias); MAE carries BOTH.  At a non-pretraining trace grid the patch
  part of the table is bicubic-resampled (same static separable-matmul
  procedure as ``vit.py``).
* **Layer scale initialised to 1.0** (BEiT uses 0.1) — upstream MAE
  fine-tune configs set ``init_values=1.0``, which makes gamma start
  as identity.
* **Depth-rescaled init** (upstream ``fix_init_weight``): block ``i``
  (1-based) divides its attention-projection and second-MLP weight
  init by ``sqrt(2 i)``, damping deep-residual variance growth at the
  start of training.

TPU notes: identical compute graph shape to BEiT — the pos-embed add
is one fused VPU op, the rel-pos machinery, einsum attention with f32
softmax, remat and frozen_stages conventions all come from the shared
block.  Checkpoint layout matches the BEiT converter with one extra
``pos_embed`` entry.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_, trunc_normal_
from ...core.registry_hub import BACKBONE
from ...utils.ops import resize_bicubic
from ..basic.convolution import Conv2d
from ..basic.normalization import LayerNorm
from ..basic.param_utils import create_param
from .beit import ARCH_TABLE, BEiTBlock

_W_INIT = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)


@BACKBONE.register()
class MAE(nn.Module):
    arch: str = "base"
    in_channels: int = 3
    embed_dims: Optional[int] = None
    num_layers: Optional[int] = None
    num_heads: Optional[int] = None
    patch_size: int = 16
    pretrain_img_size: int = 224      # grid pos/rel tables are stored at
    out_indices: Sequence[int] = (3, 5, 7, 11)
    mlp_ratio: int = 4
    qv_bias: bool = True
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1.0   # MAE init_values (BEiT: 0.1)
    final_norm: bool = False
    fix_init: bool = True                 # upstream fix_init_weight
    frozen_stages: int = -1
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        if self.arch not in ARCH_TABLE and (
                self.embed_dims is None or self.num_layers is None
                or self.num_heads is None):
            raise KeyError(f"unknown MAE arch {self.arch!r}; choose from "
                           f"{sorted(ARCH_TABLE)} or pass "
                           "embed_dims+num_layers+num_heads")
        table = ARCH_TABLE.get(self.arch, {})
        dims = self.embed_dims or table["embed_dims"]
        depth = self.num_layers or table["num_layers"]
        heads = self.num_heads or table["num_heads"]
        self.dims, self.depth = dims, depth
        self.out_ids = tuple(i % depth for i in self.out_indices)
        grid = self.pretrain_img_size // self.patch_size
        self.grid0 = grid

        stem_trainable = self.frozen_stages < 1
        self.patch_embed = Conv2d(
            self.in_channels, dims, self.patch_size, stride=self.patch_size,
            trainable=stem_trainable, weight_init=_W_INIT, bias_init=_ZEROS,
            name="patch_embed_proj")
        self.cls_token = create_param(
            self, "cls_token", _ZEROS, (1, 1, dims), stem_trainable)
        self.pos_embed = create_param(
            self, "pos_embed", _W_INIT, (1, grid * grid + 1, dims),
            stem_trainable)

        dpr = [self.drop_path_rate * i / max(depth - 1, 1)
               for i in range(depth)]
        block_cls = (nn.remat(BEiTBlock, static_argnums=(2,))
                     if self.with_cp else BEiTBlock)
        self.blocks = [
            block_cls(dims, heads, grid, mlp_ratio=self.mlp_ratio,
                      qv_bias=self.qv_bias, drop_path_rate=dpr[i],
                      layer_scale_init_value=self.layer_scale_init_value,
                      init_rescale=(math.sqrt(2.0 * (i + 1))
                                    if self.fix_init else 1.0),
                      trainable=i >= self.frozen_stages, name=f"block{i}")
            for i in range(depth)
        ]
        if self.final_norm:
            self.norm1 = LayerNorm(
                dims, trainable=self.frozen_stages < depth, name="norm1")

    def _resized_pos_embed(self, gh: int, gw: int):
        """Pos table adapted to the (gh, gw) patch grid, statically."""
        pos = self.pos_embed
        if (gh, gw) == (self.grid0, self.grid0):
            return pos
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        maps = grid_pos.reshape(1, self.grid0, self.grid0, self.dims)
        maps = resize_bicubic(maps.astype(jnp.float32), (gh, gw),
                              align_corners=False)
        maps = maps.reshape(1, gh * gw, self.dims).astype(pos.dtype)
        return jnp.concatenate([cls_pos, maps], axis=1)

    def __call__(self, x, train: bool = False):
        N = x.shape[0]
        x = self.patch_embed(x)
        gh, gw = x.shape[1:3]
        x = x.reshape(N, gh * gw, self.dims)
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype),
                               (N, 1, self.dims))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self._resized_pos_embed(gh, gw).astype(x.dtype)

        outs = []
        for i, block in enumerate(self.blocks):
            x = block(x, train)
            if i == self.depth - 1 and self.final_norm:
                x = self.norm1(x)
            if i in self.out_ids:
                outs.append(x[:, 1:].reshape(N, gh, gw, self.dims))
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
