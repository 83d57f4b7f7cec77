"""BEiT backbone (Bao et al., ICLR 2022 — "BEiT: BERT Pre-Training of
Image Transformers"; mmseg ``BEiT`` structure, the UPerNet-BEiT
segmentation configs ride it with the ``Feature2Pyramid`` neck).

Beyond-reference addition.  A ViT variant whose differences from
`models/backbones/vit.py` are exactly the ones that matter for loading
BEiT-pretrained weights:

* **No absolute position embedding.**  Positions enter through a
  per-layer **relative position bias**: a learned table indexed by the
  relative (dy, dx) offset of every token pair, plus 3 dedicated
  entries for cls→token / token→cls / cls→cls, added to the f32
  attention scores before softmax.
* **q/v-only bias**: the qkv projection carries biases on q and v but
  NOT k (upstream ``qv_bias`` — dropping the k bias is exactly neutral
  under softmax shift invariance for same-length rows, but BEiT's
  checkpoint layout stores it that way, so the converter needs it).
* **Layer scale** (``gamma_1/gamma_2``, init 0.1) on both residual
  branches.

TPU shape notes: the bias table lives at the pretraining grid
(``pretrain_img_size // patch_size``); at any other trace-time grid the
(2g-1)x(2g-1) bias field is resampled with the separable-matmul
bicubic.  For upstream checkpoints, the converter's ``--rel-pos-grid``
(tools/convert_torch_checkpoint.py) applies upstream's exact
geometric-spacing interpolation ONCE at conversion — set
``pretrain_img_size`` to the fine-tune resolution and no trace-time
resample runs at all.  The in-model bicubic remains only as the
fallback for un-converted tables at a mismatched grid (keeps the
program static; numerically different from upstream's load-time
kernel, which is why the converter path exists).  The (L+1)x(L+1) gather
from table to score layout is a static integer index built at trace
time — XLA folds it into a constant gather.  Attention runs on the
einsum path (f32 scores + bias + f32 softmax); the fused flash kernel
does not apply (it has no bias input) — documented trade-off.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_, trunc_normal_
from ...core.registry_hub import BACKBONE
from ...utils.ops import resize_bicubic
from ..basic.convolution import Conv2d, Linear
from ..basic.drop import DropPath
from ..basic.normalization import LayerNorm
from ..basic.param_utils import create_param

_W_INIT = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)

ARCH_TABLE = {
    "base": dict(embed_dims=768, num_layers=12, num_heads=12),
    "large": dict(embed_dims=1024, num_layers=24, num_heads=16),
}


def relative_position_index(gh: int, gw: int) -> np.ndarray:
    """(L+1, L+1) int index into a ((2gh-1)(2gw-1)+3,) table, cls first.

    Grid pairs map to their relative offset bucket; the last three
    entries are cls→token, token→cls, cls→cls (upstream BEiT layout).
    """
    coords = np.stack(np.meshgrid(np.arange(gh), np.arange(gw),
                                  indexing="ij"), 0).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]        # (2, L, L)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += gh - 1
    rel[..., 1] += gw - 1
    rel[..., 0] *= 2 * gw - 1
    num_rel = (2 * gh - 1) * (2 * gw - 1)
    L = gh * gw
    index = np.zeros((L + 1, L + 1), np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 1:] = num_rel        # cls -> token
    index[1:, 0] = num_rel + 1    # token -> cls
    index[0, 0] = num_rel + 2     # cls -> cls
    return index


def _rescaled(init, rescale: float):
    """Initializer divided by ``rescale`` (MAE's fix_init_weight: block
    i's residual-branch outputs start at 1/sqrt(2(i+1)) scale)."""
    if rescale == 1.0:
        return init

    def scaled(key, shape, dtype=jnp.float32):
        return init(key, shape, dtype) / rescale
    return scaled


class BEiTAttention(nn.Module):
    """MHSA with q/v-only bias and the relative position bias table."""

    embed_dims: int
    num_heads: int
    pretrain_grid: int            # side of the grid the table is stored at
    qv_bias: bool = True
    init_rescale: float = 1.0     # divides proj's init (MAE fix_init_weight)
    trainable: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N, L+1, C) with cls token leading
        N, L1, C = x.shape
        h, d = self.num_heads, self.embed_dims // self.num_heads
        g0 = self.pretrain_grid
        gh = gw = int(math.isqrt(L1 - 1))
        assert gh * gw == L1 - 1, (
            f"BEiT needs a square patch grid, got {L1 - 1} tokens")

        qkv = Linear(C, 3 * C, bias=False, trainable=self.trainable,
                     weight_init=_W_INIT, name="qkv")(x)
        if self.qv_bias:
            q_bias = create_param(self, "q_bias", _ZEROS, (C,),
                                  self.trainable)
            v_bias = create_param(self, "v_bias", _ZEROS, (C,),
                                  self.trainable)
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(qkv.dtype)
        q = qkv[..., :C].reshape(N, L1, h, d)
        k = qkv[..., C:2 * C].reshape(N, L1, h, d)
        v = qkv[..., 2 * C:].reshape(N, L1, h, d)

        num_rel0 = (2 * g0 - 1) ** 2
        table = create_param(self, "relative_position_bias_table", _ZEROS,
                             (num_rel0 + 3, h), self.trainable)
        if (gh, gw) != (g0, g0):
            # resample the 2-D bias field to the runtime grid (standard
            # BEiT fine-tune procedure), keep the 3 cls entries
            field = table[:num_rel0].reshape(1, 2 * g0 - 1, 2 * g0 - 1, h)
            field = resize_bicubic(field.astype(jnp.float32),
                                   (2 * gh - 1, 2 * gw - 1),
                                   align_corners=False)
            field = field.reshape((2 * gh - 1) * (2 * gw - 1), h)
            table = jnp.concatenate([field, table[num_rel0:]], axis=0)
        index = jnp.asarray(relative_position_index(gh, gw))
        rel_bias = table[index]                       # (L+1, L+1, h)
        rel_bias = jnp.transpose(rel_bias, (2, 0, 1)).astype(jnp.float32)

        scores = jnp.einsum("nlhd,nshd->nhls", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / math.sqrt(d)) + rel_bias[None]
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("nhls,nshd->nlhd", attn.astype(v.dtype), v)
        return Linear(C, C, trainable=self.trainable,
                      weight_init=_rescaled(_W_INIT, self.init_rescale),
                      bias_init=_ZEROS, name="proj")(out.reshape(N, L1, C))


class BEiTBlock(nn.Module):
    """x += DP(g1·attn(LN x)); x += DP(g2·MLP(LN x))."""

    embed_dims: int
    num_heads: int
    pretrain_grid: int
    mlp_ratio: int = 4
    qv_bias: bool = True
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 0.1
    init_rescale: float = 1.0     # divides attn-proj + fc2 init (MAE)
    trainable: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = self.embed_dims
        g1 = create_param(self, "gamma_1",
                          constant_(self.layer_scale_init_value), (C,),
                          self.trainable)
        g2 = create_param(self, "gamma_2",
                          constant_(self.layer_scale_init_value), (C,),
                          self.trainable)
        y = LayerNorm(C, trainable=self.trainable, name="norm1")(x)
        y = BEiTAttention(C, self.num_heads, self.pretrain_grid,
                          qv_bias=self.qv_bias,
                          init_rescale=self.init_rescale,
                          trainable=self.trainable,
                          name="attn")(y, train=train)
        x = x + DropPath(self.drop_path_rate, name="drop_path1")(
            g1 * y, train=train)
        y = LayerNorm(C, trainable=self.trainable, name="norm2")(x)
        y = Linear(C, self.mlp_ratio * C, trainable=self.trainable,
                   weight_init=_W_INIT, bias_init=_ZEROS, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = Linear(self.mlp_ratio * C, C, trainable=self.trainable,
                   weight_init=_rescaled(_W_INIT, self.init_rescale),
                   bias_init=_ZEROS, name="fc2")(y)
        return x + DropPath(self.drop_path_rate, name="drop_path2")(
            g2 * y, train=train)


@BACKBONE.register()
class BEiT(nn.Module):
    arch: str = "base"
    in_channels: int = 3
    embed_dims: Optional[int] = None
    num_layers: Optional[int] = None
    num_heads: Optional[int] = None
    patch_size: int = 16
    pretrain_img_size: int = 224      # grid the rel-pos tables are stored at
    out_indices: Sequence[int] = (3, 5, 7, 11)
    mlp_ratio: int = 4
    qv_bias: bool = True
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 0.1
    final_norm: bool = False
    frozen_stages: int = -1
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        if self.arch not in ARCH_TABLE and (
                self.embed_dims is None or self.num_layers is None
                or self.num_heads is None):
            raise KeyError(f"unknown BEiT arch {self.arch!r}; choose from "
                           f"{sorted(ARCH_TABLE)} or pass "
                           "embed_dims+num_layers+num_heads")
        table = ARCH_TABLE.get(self.arch, {})
        dims = self.embed_dims or table["embed_dims"]
        depth = self.num_layers or table["num_layers"]
        heads = self.num_heads or table["num_heads"]
        self.dims, self.depth = dims, depth
        self.out_ids = tuple(i % depth for i in self.out_indices)
        grid = self.pretrain_img_size // self.patch_size

        stem_trainable = self.frozen_stages < 1
        self.patch_embed = Conv2d(
            self.in_channels, dims, self.patch_size, stride=self.patch_size,
            trainable=stem_trainable, weight_init=_W_INIT, bias_init=_ZEROS,
            name="patch_embed_proj")
        self.cls_token = create_param(
            self, "cls_token", _ZEROS, (1, 1, dims), stem_trainable)

        dpr = [self.drop_path_rate * i / max(depth - 1, 1)
               for i in range(depth)]
        block_cls = (nn.remat(BEiTBlock, static_argnums=(2,))
                     if self.with_cp else BEiTBlock)
        self.blocks = [
            block_cls(dims, heads, grid, mlp_ratio=self.mlp_ratio,
                      qv_bias=self.qv_bias, drop_path_rate=dpr[i],
                      layer_scale_init_value=self.layer_scale_init_value,
                      trainable=i >= self.frozen_stages, name=f"block{i}")
            for i in range(depth)
        ]
        if self.final_norm:
            self.norm1 = LayerNorm(
                dims, trainable=self.frozen_stages < depth, name="norm1")

    def __call__(self, x, train: bool = False):
        N = x.shape[0]
        x = self.patch_embed(x)
        gh, gw = x.shape[1:3]
        x = x.reshape(N, gh * gw, self.dims)
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype),
                               (N, 1, self.dims))
        x = jnp.concatenate([cls, x], axis=1)

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
