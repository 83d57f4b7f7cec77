"""BiSeNetV2 backbone (Yu et al., IJCV 2021: "BiSeNet V2: Bilateral
Network with Guided Aggregation for Real-time Semantic Segmentation").

Beyond-reference addition — the realtime family: a wide, shallow
**detail branch** (three conv stages to 1/8, 128ch) runs beside a
narrow, deep **semantic branch** (stem to 1/4, gather-expansion blocks
to 1/32, global context embedding), fused by **bilateral guided
aggregation** (each branch gates the other through sigmoid attention at
both 1/8 and 1/32 scales).

TPU notes: everything is 3x3/1x1 conv + BN + ReLU — the exact shapes
the MXU eats; depthwise expansions are full-lane VPU work; the only
non-conv ops are two sigmoid gates and one global average pool.
Pooling uses the framework's torch-parity ``ops.pooling`` (MaxPool
3/2/1, AvgPool 3/2/1 with count_include_pad).  Outputs (NHWC):
``(bga_fused 128@1/8, stem 16@1/4, ge 32@1/8, ge 64@1/16,
ge 128@1/32)`` — index 0 feeds the decode head, 1..4 the aux heads.

Wiring (pinned by the torch twin in tests/test_bisenetv2.py):

* DetailBranch stages: [C(3→64,s2), C(64)] / [C(64,s2), C(64), C(64)] /
  [C(64→128,s2), C(128), C(128)], all 3x3 conv+BN+ReLU.
* StemBlock: C(3→16,3x3,s2); then branch A = C(16→8,1x1) →
  C(8→16,3x3,s2), branch B = MaxPool(3,2,1); concat → C(32→16,3x3).
* GELayer(in→out, e=6, stride): C(in,3x3) → [s1: DW(in→6·in,3x3)] or
  [s2: DW(in→6·in,3x3,s2) → DW(6·in,3x3)] → 1x1(→out, no act);
  shortcut = identity (s1) or DW(in,3x3,s2,no act)+1x1(→out, no act);
  ReLU after the residual add.  Depthwise convs carry BN, no act.
* CEBlock: BN(gap(x)) → C(1x1) → broadcast-add x → C(3x3).
* BGALayer: detail side {DW(3x3)+1x1-bare, C(3x3,s2,no act)+AvgPool}
  x semantic side {C(3x3,no act)↑4, DW(3x3)+1x1-bare}; fuse =
  C(3x3)( d_hi·σ(s_hi↑4) + (d_lo·σ(s_lo))↑4 ).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...ops.pooling import adaptive_avg_pool2d, avg_pool2d, max_pool2d
from ...utils.ops import resize
from ...core.registry_hub import NORMALIZATION
from ..basic.convolution import Conv2d
from ..common.conv_module import ConvModule


def _bn(norm_cfg, ch, name):
    """Standalone norm layer honoring the config's requires_grad/eps,
    constructed inline (bound) with an explicit flax name."""
    cfg = dict(norm_cfg or {"type": "BN"})
    layer_cls = NORMALIZATION.get(cfg.pop("type"))
    trainable = cfg.pop("requires_grad", True)
    cfg.setdefault("eps", 1e-5)
    return layer_cls(ch, trainable=trainable, name=name, **cfg)


class DetailBranch(nn.Module):
    detail_channels: Sequence[int] = (64, 64, 128)
    in_channels: int = 3
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = self.in_channels
        for i, ch in enumerate(self.detail_channels):
            n_flat = 1 if i == 0 else 2
            x = ConvModule(in_ch, ch, 3, stride=2, padding=1,
                           norm_cfg=self.norm_cfg or dict(type="BN"),
                           name=f"stage{i}_conv0")(x, train=train)
            for j in range(n_flat):
                x = ConvModule(ch, ch, 3, padding=1, norm_cfg=self.norm_cfg or dict(type="BN"),
                               name=f"stage{i}_conv{j + 1}")(x, train=train)
            in_ch = ch
        return x


class StemBlock(nn.Module):
    in_channels: int = 3
    out_channels: int = 16
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = self.out_channels
        x = ConvModule(self.in_channels, C, 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg or dict(type="BN"), name="conv_first")(
            x, train=train)
        a = ConvModule(C, C // 2, 1, norm_cfg=self.norm_cfg or dict(type="BN"),
                       name="convs_0")(x, train=train)
        a = ConvModule(C // 2, C, 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg or dict(type="BN"), name="convs_1")(
            a, train=train)
        b = max_pool2d(x, 3, stride=2, padding=1)
        return ConvModule(2 * C, C, 3, padding=1, norm_cfg=self.norm_cfg or dict(type="BN"),
                          name="fuse_last")(
            jnp.concatenate([a, b], axis=-1), train=train)


class GELayer(nn.Module):
    in_channels: int
    out_channels: int
    exp_ratio: int = 6
    stride: int = 1
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin, cout, mid = self.in_channels, self.out_channels, \
            self.in_channels * self.exp_ratio
        identity = x
        y = ConvModule(cin, cin, 3, padding=1, norm_cfg=self.norm_cfg or dict(type="BN"),
                       name="conv1")(x, train=train)
        if self.stride == 1:
            y = ConvModule(cin, mid, 3, padding=1, groups=cin,
                           norm_cfg=self.norm_cfg or dict(type="BN"), act_cfg=None,
                           name="dwconv_0")(y, train=train)
        else:
            y = ConvModule(cin, mid, 3, stride=2, padding=1, groups=cin,
                           norm_cfg=self.norm_cfg or dict(type="BN"), act_cfg=None,
                           name="dwconv_0")(y, train=train)
            y = ConvModule(mid, mid, 3, padding=1, groups=mid,
                           norm_cfg=self.norm_cfg or dict(type="BN"), act_cfg=None,
                           name="dwconv_1")(y, train=train)
        y = ConvModule(mid, cout, 1, norm_cfg=self.norm_cfg or dict(type="BN"), act_cfg=None,
                       name="conv2")(y, train=train)
        if self.stride != 1 or cin != cout:
            s = ConvModule(cin, cin, 3, stride=self.stride, padding=1,
                           groups=cin, norm_cfg=self.norm_cfg or dict(type="BN"), act_cfg=None,
                           name="shortcut_dw")(identity, train=train)
            identity = ConvModule(cin, cout, 1, norm_cfg=self.norm_cfg or dict(type="BN"),
                                  act_cfg=None, name="shortcut_pw")(
                s, train=train)
        return nn.relu(y + identity)


class CEBlock(nn.Module):
    in_channels: int = 128
    out_channels: int = 128
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = adaptive_avg_pool2d(x, 1)
        y = _bn(self.norm_cfg, self.in_channels, "gap_norm")(y, train=train)
        y = ConvModule(self.in_channels, self.out_channels, 1,
                       norm_cfg=self.norm_cfg or dict(type="BN"), name="conv_gap")(
            y, train=train)
        y = identity + y                       # broadcast over H, W
        return ConvModule(self.out_channels, self.out_channels, 3, padding=1,
                          norm_cfg=self.norm_cfg or dict(type="BN"), name="conv_last")(
            y, train=train)


class SemanticBranch(nn.Module):
    semantic_channels: Sequence[int] = (16, 32, 64, 128)
    in_channels: int = 3
    exp_ratio: int = 6
    norm_cfg: Optional[dict] = None

    def setup(self):
        chs = self.semantic_channels
        self.stem = StemBlock(self.in_channels, chs[0],
                              norm_cfg=self.norm_cfg or dict(type="BN"), name="stem")
        stages = []
        for i in range(1, len(chs)):
            n_blocks = 4 if i == len(chs) - 1 else 2
            blocks = [GELayer(chs[i - 1], chs[i], self.exp_ratio, stride=2,
                              norm_cfg=self.norm_cfg or dict(type="BN"),
                              name=f"stage{i}_ge0")]
            blocks += [GELayer(chs[i], chs[i], self.exp_ratio, stride=1,
                               norm_cfg=self.norm_cfg or dict(type="BN"),
                               name=f"stage{i}_ge{j}")
                       for j in range(1, n_blocks)]
            stages.append(blocks)
        self.stages = stages
        self.ce = CEBlock(chs[-1], chs[-1], norm_cfg=self.norm_cfg or dict(type="BN"),
                          name="ce")

    def __call__(self, x, train: bool = False):
        outs = []
        x = self.stem(x, train=train)
        outs.append(x)
        for blocks in self.stages:
            for block in blocks:
                x = block(x, train=train)
            outs.append(x)
        outs.append(self.ce(x, train=train))   # last: context-embedded 1/32
        return outs


class BGALayer(nn.Module):
    out_channels: int = 128
    align_corners: bool = False
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x_d, x_s, train: bool = False):
        C = self.out_channels
        d_hi = ConvModule(C, C, 3, padding=1, groups=C,
                          norm_cfg=self.norm_cfg or dict(type="BN"), act_cfg=None,
                          name="detail_dwconv")(x_d, train=train)
        d_hi = Conv2d(C, C, 1, name="detail_dwconv_pw")(d_hi)
        d_lo = ConvModule(C, C, 3, stride=2, padding=1,
                          norm_cfg=self.norm_cfg or dict(type="BN"), act_cfg=None,
                          name="detail_down")(x_d, train=train)
        d_lo = avg_pool2d(d_lo, 3, stride=2, padding=1)
        s_hi = ConvModule(C, C, 3, padding=1, norm_cfg=self.norm_cfg or dict(type="BN"),
                          act_cfg=None, name="semantic_conv")(
            x_s, train=train)
        s_hi = resize(s_hi, size=x_d.shape[1:3], mode="bilinear",
                      align_corners=self.align_corners)
        s_lo = ConvModule(C, C, 3, padding=1, groups=C,
                          norm_cfg=self.norm_cfg or dict(type="BN"), act_cfg=None,
                          name="semantic_dwconv")(x_s, train=train)
        s_lo = Conv2d(C, C, 1, name="semantic_dwconv_pw")(s_lo)
        fuse_hi = d_hi * nn.sigmoid(s_hi)
        fuse_lo = d_lo * nn.sigmoid(s_lo)
        fuse_lo = resize(fuse_lo, size=x_d.shape[1:3], mode="bilinear",
                         align_corners=self.align_corners)
        return ConvModule(C, C, 3, padding=1, norm_cfg=self.norm_cfg or dict(type="BN"),
                          name="conv")(fuse_hi + fuse_lo, train=train)


@BACKBONE.register("BiSeNetV2")
class BiSeNetV2(nn.Module):
    in_channels: int = 3
    detail_channels: Sequence[int] = (64, 64, 128)
    semantic_channels: Sequence[int] = (16, 32, 64, 128)
    semantic_expansion_ratio: int = 6
    bga_channels: int = 128
    out_indices: Sequence[int] = (0, 1, 2, 3, 4)
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        assert self.detail_channels[-1] == self.semantic_channels[-1] \
            == self.bga_channels, "branch widths must meet at the BGA"
        self.detail = DetailBranch(self.detail_channels, self.in_channels,
                                   norm_cfg=self.norm_cfg or dict(type="BN"), name="detail")
        self.semantic = SemanticBranch(self.semantic_channels,
                                       self.in_channels,
                                       self.semantic_expansion_ratio,
                                       norm_cfg=self.norm_cfg or dict(type="BN"),
                                       name="semantic")
        self.bga = BGALayer(self.bga_channels, self.align_corners,
                            norm_cfg=self.norm_cfg or dict(type="BN"), name="bga")

    def __call__(self, x, train: bool = False):
        x_detail = self.detail(x, train=train)
        semantic_outs = self.semantic(x, train=train)
        fused = self.bga(x_detail, semantic_outs[-1], train=train)
        outs = [fused] + semantic_outs[:-1]
        outs = [outs[i] for i in self.out_indices]
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)
