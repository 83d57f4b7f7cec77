"""Swin Transformer backbone (Liu et al., ICCV 2021).

Beyond-reference addition (the reference lab `/root/reference` ships only
CNN backbones): hierarchical windowed attention, the canonical UPerNet
pairing.  Re-derived TPU-first:

* **Window partitioning is a reshape**, not a gather: NHWC features fold
  to ``(N·nW, ws², C)`` with two reshape/transpose pairs that XLA lowers
  to free layout changes; attention inside each window is two batched
  einsums (QK^T / PV) with f32 score accumulation and f32 softmax — pure
  MXU work on ws²=49-token tiles.
* **The shifted-window mask is a compile-time constant.**  Window/shift
  geometry is static per trace, so the (nW, ws², ws²) cross-boundary mask
  is built in numpy at trace time and folded into the program; the cyclic
  shift itself is ``jnp.roll`` (a pair of static slices under XLA).
* **Relative position bias** is one table parameter per block,
  gathered with a static index matrix (again trace-time numpy).
* Non-divisible feature sizes are zero-padded up to the window grid and
  cropped after attention — padding tokens are kept out of softmax by the
  same additive-mask mechanism as the shift.
* ``with_cp`` → ``nn.remat`` per block; ``frozen_stages`` routes patch
  embed + the first k stages into ``frozen_params`` (CLAUDE.md
  convention).

Arch table: tiny = depths (2,2,6,2), dims 96, heads (3,6,12,24);
small = (2,2,18,2), 96, same heads; base = (2,2,18,2), 128, (4,8,16,32);
large = (2,2,18,2), 192, (6,12,24,48).  Window size 7, MLP ratio 4.
Stage i output dim = dims·2^i with a per-output LayerNorm (the
segmentation contract, as in UPerNet's Swin recipe).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.initialize.init_functions import constant_, trunc_normal_
from ...core.registry_hub import BACKBONE
from ..basic.convolution import Conv2d, Linear
from ..basic.drop import Dropout, DropPath
from ..basic.normalization import LayerNorm
from ..basic.param_utils import create_param

_W_INIT = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)

ARCH_TABLE = {
    "tiny": dict(depths=(2, 2, 6, 2), embed_dims=96,
                 num_heads=(3, 6, 12, 24)),
    "small": dict(depths=(2, 2, 18, 2), embed_dims=96,
                  num_heads=(3, 6, 12, 24)),
    "base": dict(depths=(2, 2, 18, 2), embed_dims=128,
                 num_heads=(4, 8, 16, 32)),
    "large": dict(depths=(2, 2, 18, 2), embed_dims=192,
                  num_heads=(6, 12, 24, 48)),
}


def relative_position_index(ws: int) -> np.ndarray:
    """Static (ws², ws²) index into the (2ws-1)² bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # (2, ws, ws)
    flat = coords.reshape(2, -1)                           # (2, ws²)
    rel = flat[:, :, None] - flat[:, None, :]              # (2, ws², ws²)
    rel = rel.transpose(1, 2, 0) + (ws - 1)                # shift to ≥0
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shift_attention_mask(hp: int, wp: int, ws: int, shift: int,
                         h_real: int, w_real: int) -> np.ndarray:
    """Static (nW, ws², ws²) additive mask: -100 where two tokens of one
    window belong to different shifted regions OR either is padding."""
    # group labels in the ORIGINAL (unrolled, padded) frame: rows [0,shift)
    # wrap to the bottom window row after the cyclic shift, rows
    # [hp-ws+shift, hp) stay in it unwrapped — rolling these labels by
    # -shift reproduces the canonical rolled-frame 9-region mask of the
    # torch implementation exactly (verified by the golden test)
    def groups(n: int) -> np.ndarray:
        g = np.zeros(n, np.int32)
        if shift:
            g[:shift] = 2
            g[n - ws + shift:] = 1
        return g

    region = groups(hp)[:, None] * 3 + groups(wp)[None, :]
    # padding tokens get a region id of their own so real tokens never
    # attend to them (query-pad rows are garbage but are cropped away)
    pad_region = region.max() + 1
    region[h_real:, :] = pad_region
    region[:, w_real:] = pad_region
    if shift:
        region = np.roll(region, (-shift, -shift), axis=(0, 1))
    win = region.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)                         # (nW, ws²)
    same = win[:, :, None] == win[:, None, :]
    return np.where(same, 0.0, -100.0).astype(np.float32)


class WindowMSA(nn.Module):
    """Multi-head self-attention within (merged) windows, with relative
    position bias; ``mask`` is the static shift/pad additive mask."""

    embed_dims: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    trainable: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, *,
                 mask: Optional[jnp.ndarray] = None):
        B, L, C = x.shape                      # B = N·nW, L = ws²
        h, d = self.num_heads, self.embed_dims // self.num_heads
        ws = self.window_size
        qkv = Linear(C, 3 * C, bias=self.qkv_bias, trainable=self.trainable,
                     weight_init=_W_INIT, bias_init=_ZEROS, name="qkv")(x)
        q = qkv[..., :C].reshape(B, L, h, d)
        k = qkv[..., C:2 * C].reshape(B, L, h, d)
        v = qkv[..., 2 * C:].reshape(B, L, h, d)

        scores = jnp.einsum("blhd,bshd->bhls", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / math.sqrt(d))

        table = create_param(
            self, "relative_position_bias_table",
            trunc_normal_(0.0, 0.02),
            ((2 * ws - 1) ** 2, h), self.trainable)
        idx = relative_position_index(ws)      # static (L, L)
        bias = table[idx.reshape(-1)].reshape(L, L, h)
        scores = scores + bias.transpose(2, 0, 1)[None].astype(scores.dtype)

        if mask is not None:                   # (nW, L, L) static
            nW = mask.shape[0]
            scores = scores.reshape(B // nW, nW, h, L, L) \
                + mask[None, :, None].astype(scores.dtype)
            scores = scores.reshape(B, h, L, L)
        attn = nn.softmax(scores, axis=-1)
        attn = Dropout(self.attn_drop_rate, name="attn_drop")(
            attn, train=train)
        out = jnp.einsum("bhls,bshd->blhd", attn.astype(v.dtype), v)
        out = Linear(C, C, trainable=self.trainable, weight_init=_W_INIT,
                     bias_init=_ZEROS, name="proj")(out.reshape(B, L, C))
        return Dropout(self.proj_drop_rate, name="proj_drop")(
            out, train=train)


class SwinBlock(nn.Module):
    """Pre-norm: x += DropPath(W-MSA(LN x)); x += DropPath(FFN(LN x)).
    ``shift`` alternates 0 / ws//2 along the stage."""

    embed_dims: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: int = 4
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    trainable: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        N, H, W, C = x.shape
        ws = self.window_size
        # the window size never shrinks (the bias-table shape must not
        # depend on input resolution); maps smaller than one window pad UP
        # to it, with the pad mask keeping pad tokens out of softmax, and
        # shifting is pointless (and disabled) once one window covers the
        # whole map
        shift = self.shift if min(H, W) > ws else 0
        hp, wp = -(-H // ws) * ws, -(-W // ws) * ws

        y = LayerNorm(C, trainable=self.trainable, name="norm1")(x)
        # canonical order: pad to the window grid FIRST, then cyclic-shift
        # the padded map — the mask below models the roll as modulo (hp,wp),
        # so rolling before padding would let wrapped border tokens attend
        # pad tokens / lose their legitimate shifted-window partners
        if (hp, wp) != (H, W):
            y = jnp.pad(y, ((0, 0), (0, hp - H), (0, wp - W), (0, 0)))
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        mask = None
        if shift or (hp, wp) != (H, W):
            mask = jnp.asarray(shift_attention_mask(hp, wp, ws, shift, H, W))
        nwh, nww = hp // ws, wp // ws
        y = y.reshape(N, nwh, ws, nww, ws, C).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(N * nwh * nww, ws * ws, C)
        y = WindowMSA(C, self.num_heads, ws, qkv_bias=self.qkv_bias,
                      attn_drop_rate=self.attn_drop_rate,
                      proj_drop_rate=self.drop_rate,
                      trainable=self.trainable, name="attn")(
            y, train=train, mask=mask)
        y = y.reshape(N, nwh, nww, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(N, hp, wp, C)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :H, :W]
        x = x + DropPath(self.drop_path_rate, name="drop_path1")(
            y, train=train)

        y = LayerNorm(C, trainable=self.trainable, name="norm2")(x)
        y = Linear(C, self.mlp_ratio * C, trainable=self.trainable,
                   weight_init=_W_INIT, bias_init=_ZEROS, name="fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default is exact
        y = Dropout(self.drop_rate, name="drop1")(y, train=train)
        y = Linear(self.mlp_ratio * C, C, trainable=self.trainable,
                   weight_init=_W_INIT, bias_init=_ZEROS, name="fc2")(y)
        y = Dropout(self.drop_rate, name="drop2")(y, train=train)
        return x + DropPath(self.drop_path_rate, name="drop_path2")(
            y, train=train)


class PatchMerging(nn.Module):
    """2x2 neighborhood concat (4C) → LN → Linear(4C → 2C, no bias)."""

    in_dims: int
    trainable: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        N, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            H, W = x.shape[1:3]
        # (N, H/2, 2, W/2, 2, C) → torch order [x0 x1 x2 x3] =
        # [(0,0), (1,0), (0,1), (1,1)] along channels
        x = x.reshape(N, H // 2, 2, W // 2, 2, C)
        x = jnp.concatenate([x[:, :, 0, :, 0], x[:, :, 1, :, 0],
                             x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)
        x = LayerNorm(4 * C, trainable=self.trainable, name="norm")(x)
        return Linear(4 * C, 2 * C, bias=False, trainable=self.trainable,
                      weight_init=_W_INIT, name="reduction")(x)


@BACKBONE.register("SwinTransformer", aliases=("Swin",))
class SwinTransformer(nn.Module):
    arch: str = "tiny"
    in_channels: int = 3
    depths: Optional[Sequence[int]] = None    # override the arch table
    embed_dims: Optional[int] = None
    num_heads: Optional[Sequence[int]] = None
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: int = 4
    qkv_bias: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    frozen_stages: int = -1
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        if self.arch not in ARCH_TABLE and (
                self.depths is None or self.embed_dims is None
                or self.num_heads is None):
            raise KeyError(f"unknown Swin arch {self.arch!r}; choose from "
                           f"{sorted(ARCH_TABLE)} or pass "
                           "depths+embed_dims+num_heads")
        table = ARCH_TABLE.get(self.arch, {})
        depths = tuple(self.depths or table["depths"])
        heads = tuple(self.num_heads or table["num_heads"])
        dims0 = self.embed_dims or table["embed_dims"]
        assert len(depths) == len(heads)
        assert max(self.out_indices) < len(depths)
        if self.frozen_stages not in range(-1, len(depths) + 1):
            raise ValueError(
                f"frozen_stages must be in range(-1, {len(depths) + 1}), "
                f"got {self.frozen_stages}")
        self.stage_depths = depths

        total = sum(depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        block_cls = (nn.remat(SwinBlock, static_argnums=(2,))
                     if self.with_cp else SwinBlock)

        stem_trainable = self.frozen_stages < 1  # stem freezes with stage 0
        self.patch_embed = Conv2d(
            self.in_channels, dims0, self.patch_size, stride=self.patch_size,
            trainable=stem_trainable, weight_init=_W_INIT, bias_init=_ZEROS,
            name="patch_embed_proj")
        self.patch_norm = LayerNorm(dims0, trainable=stem_trainable,
                                    name="patch_embed_norm")
        self.pos_drop = Dropout(self.drop_rate, name="pos_drop")

        stages, merges, out_norms = [], [], {}
        cur = 0
        for i, depth in enumerate(depths):
            trainable = i >= self.frozen_stages
            dim = dims0 * 2 ** i
            stages.append([
                block_cls(dim, heads[i], window_size=self.window_size,
                          shift=0 if j % 2 == 0 else self.window_size // 2,
                          mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                          drop_rate=self.drop_rate,
                          attn_drop_rate=self.attn_drop_rate,
                          drop_path_rate=dpr[cur + j], trainable=trainable,
                          name=f"stage{i}_block{j}")
                for j in range(depth)
            ])
            if i in self.out_indices:
                out_norms[i] = LayerNorm(dim, trainable=trainable,
                                         name=f"norm{i}")
            if i < len(depths) - 1:
                merges.append(PatchMerging(
                    dim, trainable=(i + 1) >= self.frozen_stages,
                    name=f"downsample{i}"))
            cur += depth
        self.stages = stages
        self.downsamples = merges
        self.out_norms = out_norms

    def __call__(self, x, train: bool = False):
        x = self.patch_norm(self.patch_embed(x))
        x = self.pos_drop(x, train=train)
        outs = []
        for i in range(len(self.stage_depths)):
            for block in self.stages[i]:
                x = block(x, train)
            if i in self.out_indices:
                outs.append(self.out_norms[i](x))
            if i < len(self.stage_depths) - 1:
                x = self.downsamples[i](x, train=train)
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
