"""Vision Transformer backbone (Dosovitskiy et al., ICLR 2021) for
segmentation — the SETR encoder (Zheng et al., CVPR 2021).

Beyond-reference addition (the reference lab `/root/reference` ships only
CNN backbones): the plain isotropic ViT, re-derived TPU-first:

* **Full attention as two batched MXU einsums** (QK^T / PV) over all
  patch (+cls) tokens, f32 score accumulation and f32 softmax, cast back
  to the compute dtype for PV — at 640² input a ViT/16 attends over
  L=1601 tokens, so each matmul is a well-tiled (L x d) x (d x L)
  systolic-array pass (contrast Swin's 49-token windows).
* **Position embeddings are resolution-adapted at trace time.**  The
  learned table lives at the pretraining grid (``pretrain_img_size //
  patch_size``); for any other input the grid part is resized with the
  framework's separable-matmul bicubic (``utils/ops.resize_bicubic``,
  torch-parity a=-0.75 kernel) under static shapes — no dynamic control
  flow, one extra pair of small matmuls folded into the program.
* Tokens keep a ``(N, L, C)`` layout between blocks (C on the 128-lane
  axis); NHWC maps are re-materialized only at the tapped
  ``out_indices``, as pure reshapes.
* ``with_cp`` → ``nn.remat`` per block; ``frozen_stages`` freezes the
  patch embed + cls/pos tables + the first k blocks into
  ``frozen_params`` (CLAUDE.md convention; k = num_layers freezes the
  final norm too).

Arch table (ViT paper Table 1 + DeiT-Ti/S): tiny = 192 dims, 12 layers,
3 heads; small = 384/12/6; base = 768/12/12; large = 1024/24/16.
MLP ratio 4, patch 16.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_, trunc_normal_
from ...core.registry_hub import BACKBONE
from ...ops.attention import multihead_attention
from ...utils.ops import resize_bicubic, resize_bilinear
from ..basic.convolution import Conv2d, Linear
from ..basic.drop import Dropout, DropPath
from ..basic.normalization import LayerNorm
from ..basic.param_utils import create_param

_W_INIT = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)

ARCH_TABLE = {
    "tiny": dict(embed_dims=192, num_layers=12, num_heads=3),
    "small": dict(embed_dims=384, num_layers=12, num_heads=6),
    "base": dict(embed_dims=768, num_layers=12, num_heads=12),
    "large": dict(embed_dims=1024, num_layers=24, num_heads=16),
}


class MultiheadAttention(nn.Module):
    """Full self-attention over the token sequence."""

    embed_dims: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    trainable: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        N, L, C = x.shape
        h, d = self.num_heads, self.embed_dims // self.num_heads
        assert h * d == C, (C, h)
        qkv = Linear(C, 3 * C, bias=self.qkv_bias, trainable=self.trainable,
                     weight_init=_W_INIT, bias_init=_ZEROS, name="qkv")(x)
        q = qkv[..., :C].reshape(N, L, h, d)
        k = qkv[..., C:2 * C].reshape(N, L, h, d)
        v = qkv[..., 2 * C:].reshape(N, L, h, d)
        if self.attn_drop_rate > 0.0 and train:
            # probability dropout forces the materialized-score path
            scores = jnp.einsum("nlhd,nshd->nhls", q, k,
                                preferred_element_type=jnp.float32)
            attn = nn.softmax(scores * (1.0 / math.sqrt(d)), axis=-1)
            attn = Dropout(self.attn_drop_rate, name="attn_drop")(
                attn, train=train)
            out = jnp.einsum("nhls,nshd->nlhd", attn.astype(v.dtype), v)
        else:
            # fused flash kernel on TPU in its winning regime, XLA
            # einsums otherwise (ops/attention.py)
            out = multihead_attention(q, k, v, 1.0 / math.sqrt(d),
                                      train=train)
        out = Linear(C, C, trainable=self.trainable, weight_init=_W_INIT,
                     bias_init=_ZEROS, name="proj")(out.reshape(N, L, C))
        return Dropout(self.proj_drop_rate, name="proj_drop")(
            out, train=train)


class ViTBlock(nn.Module):
    """Pre-norm: x += DropPath(MHSA(LN x)); x += DropPath(MLP(LN x))."""

    embed_dims: int
    num_heads: int
    mlp_ratio: int = 4
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    trainable: bool = True
    # MoE (Switch top-1) FFN in place of the dense MLP when >= 2 —
    # see models/utils/moe.py; enables expert parallelism
    num_experts: int = 0
    moe_capacity_factor: float = 1.25
    moe_aux_loss_weight: float = 0.01

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = self.embed_dims
        y = LayerNorm(C, trainable=self.trainable, name="norm1")(x)
        y = MultiheadAttention(C, self.num_heads, qkv_bias=self.qkv_bias,
                               attn_drop_rate=self.attn_drop_rate,
                               proj_drop_rate=self.drop_rate,
                               trainable=self.trainable, name="attn")(
            y, train=train)
        x = x + DropPath(self.drop_path_rate, name="drop_path1")(
            y, train=train)
        y = LayerNorm(C, trainable=self.trainable, name="norm2")(x)
        if self.num_experts >= 2:
            from ..utils.moe import MoEFFN
            y = MoEFFN(C, self.mlp_ratio * C, self.num_experts,
                       capacity_factor=self.moe_capacity_factor,
                       aux_loss_weight=self.moe_aux_loss_weight,
                       trainable=self.trainable, name="moe")(y, train=train)
            y = Dropout(self.drop_rate, name="drop2")(y, train=train)
        else:
            y = Linear(C, self.mlp_ratio * C, trainable=self.trainable,
                       weight_init=_W_INIT, bias_init=_ZEROS, name="fc1")(y)
            y = nn.gelu(y, approximate=False)  # torch GELU default: exact
            y = Dropout(self.drop_rate, name="drop1")(y, train=train)
            y = Linear(self.mlp_ratio * C, C, trainable=self.trainable,
                       weight_init=_W_INIT, bias_init=_ZEROS, name="fc2")(y)
            y = Dropout(self.drop_rate, name="drop2")(y, train=train)
        return x + DropPath(self.drop_path_rate, name="drop_path2")(
            y, train=train)


@BACKBONE.register("VisionTransformer", aliases=("ViT",))
class VisionTransformer(nn.Module):
    arch: str = "base"
    in_channels: int = 3
    embed_dims: Optional[int] = None      # override the arch table
    num_layers: Optional[int] = None
    num_heads: Optional[int] = None
    patch_size: int = 16
    pretrain_img_size: int = 224          # grid the pos table is stored at
    with_cls_token: bool = True           # cls token attends with patches
    out_indices: Sequence[int] = (-1,)    # blocks to tap (NHWC maps)
    output_cls_token: bool = False        # yield (map, cls) tuples (DPT)
    final_norm: bool = False              # LN after the last block
    interpolate_mode: str = "bicubic"     # pos-table resize kernel
    mlp_ratio: int = 4
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    frozen_stages: int = -1               # freeze embed + first k blocks
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None
    # MoE: replace the dense MLP with a Switch top-1 MoE FFN in the
    # blocks listed in moe_layers (default: every second block, the
    # Switch/GShard convention) — see models/utils/moe.py
    num_experts: int = 0
    moe_layers: Optional[Sequence[int]] = None
    moe_capacity_factor: float = 1.25
    moe_aux_loss_weight: float = 0.01

    def setup(self):
        if self.arch not in ARCH_TABLE and (
                self.embed_dims is None or self.num_layers is None
                or self.num_heads is None):
            raise KeyError(f"unknown ViT arch {self.arch!r}; choose from "
                           f"{sorted(ARCH_TABLE)} or pass "
                           "embed_dims+num_layers+num_heads")
        table = ARCH_TABLE.get(self.arch, {})
        dims = self.embed_dims or table["embed_dims"]
        depth = self.num_layers or table["num_layers"]
        heads = self.num_heads or table["num_heads"]
        if self.frozen_stages not in range(-1, depth + 1):
            raise ValueError(
                f"frozen_stages must be in range(-1, {depth + 1}), "
                f"got {self.frozen_stages}")
        self.dims, self.depth = dims, depth
        self.out_ids = tuple(i % depth for i in self.out_indices)
        assert all(0 <= i < depth for i in self.out_ids), self.out_indices
        if self.interpolate_mode not in ("bicubic", "bilinear"):
            raise ValueError(
                f"interpolate_mode must be bicubic|bilinear, "
                f"got {self.interpolate_mode!r}")

        grid = self.pretrain_img_size // self.patch_size
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
        self.pos_drop = Dropout(self.drop_rate, name="pos_drop")

        dpr = [self.drop_path_rate * i / max(depth - 1, 1)
               for i in range(depth)]
        block_cls = (nn.remat(ViTBlock, static_argnums=(2,))
                     if self.with_cp else ViTBlock)
        moe_ids = (set(self.moe_layers) if self.moe_layers is not None
                   else set(range(1, depth, 2))) \
            if self.num_experts >= 2 else set()
        self.blocks = [
            block_cls(dims, heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=self.qkv_bias, drop_rate=self.drop_rate,
                      attn_drop_rate=self.attn_drop_rate,
                      drop_path_rate=dpr[i],
                      trainable=i >= self.frozen_stages,
                      num_experts=self.num_experts if i in moe_ids else 0,
                      moe_capacity_factor=self.moe_capacity_factor,
                      moe_aux_loss_weight=self.moe_aux_loss_weight,
                      name=f"block{i}")
            for i in range(depth)
        ]
        if self.final_norm:
            self.norm1 = LayerNorm(
                dims, trainable=self.frozen_stages < depth, name="norm1")

    def _resized_pos_embed(self, gh: int, gw: int):
        """Pos table adapted to the (gh, gw) patch grid, statically."""
        grid = self.pretrain_img_size // self.patch_size
        pos = self.pos_embed
        if (gh, gw) == (grid, grid):
            return pos
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        maps = grid_pos.reshape(1, grid, grid, self.dims)
        resizer = (resize_bicubic if self.interpolate_mode == "bicubic"
                   else resize_bilinear)
        maps = resizer(maps.astype(jnp.float32), (gh, gw),
                       align_corners=False)
        maps = maps.reshape(1, gh * gw, self.dims).astype(pos.dtype)
        return jnp.concatenate([cls_pos, maps], axis=1)

    def __call__(self, x, train: bool = False):
        N = x.shape[0]
        x = self.patch_embed(x)                       # (N, gh, gw, C)
        gh, gw = x.shape[1:3]
        x = x.reshape(N, gh * gw, self.dims)
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype),
                               (N, 1, self.dims))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self._resized_pos_embed(gh, gw).astype(x.dtype)
        if not self.with_cls_token:
            x = x[:, 1:]
        x = self.pos_drop(x, train=train)

        lead = 1 if self.with_cls_token else 0
        outs = []
        for i, block in enumerate(self.blocks):
            x = block(x, train)
            if i == self.depth - 1 and self.final_norm:
                x = self.norm1(x)
            if i in self.out_ids:
                fmap = x[:, lead:].reshape(N, gh, gw, self.dims)
                if self.output_cls_token:
                    assert self.with_cls_token, \
                        "output_cls_token requires with_cls_token"
                    outs.append((fmap, x[:, 0]))
                else:
                    outs.append(fmap)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
