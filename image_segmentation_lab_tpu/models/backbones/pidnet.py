"""PIDNet backbone (Xu et al., CVPR 2023 — "PIDNet: A Real-time Semantic
Segmentation Network Inspired by PID Controllers"; mmseg ``PIDNet``
structure).

Beyond-reference realtime family, the successor of DDRNet
(`models/backbones/ddrnet.py`).  After the shared 1/8 trunk the network
runs THREE branches in the role of a PID controller:

* **P** (proportional / detail): stays at 1/8, keeps boundaries sharp;
  fed by the I branch through **PagFM** — pixel-attention-guided fusion
  where a sigmoid similarity gate decides per pixel whether to take the
  upsampled context or keep the local detail.
* **I** (integral / context): strides on to 1/64 and is summarized by a
  **PAPPM** pyramid (the parallel variant of DDRNet's DAPPM: the four
  pooled branches are refined by ONE grouped 3x3 conv instead of a
  sequential cascade — shorter dependence chain, better for the MXU).
* **D** (derivative / boundary): a thin branch predicting where labels
  change, fed by strided "diff" taps off the I branch; its sigmoid
  output steers the final **Bag/LightBag** fusion (boundary pixels take
  the P features, interior pixels the I features).

Everything is 3x3/1x1 conv+BN+ReLU on the MXU.  Divergence notes (both
shared with the DDRNet port and pinned by its tests): (a) the official
blocks end stages without a ReLU and rectify at the next stage — this
implementation reuses the always-ReLU ``BasicBlock``/``Bottleneck`` from
`models/backbones/resnet.py`, so stage-boundary ``nn.relu`` calls are
idempotent; (b) upstream's PIDNet-Bottleneck has expansion 2 (1x1 to p,
3x3 at p, 1x1 to 2p) — here the shared expansion-4 Bottleneck runs with
``planes = p // 2`` (same input/output widths, half-width 3x3 core).

Outputs (always, train and eval): ``(x_p @1/8 2C, x_d @1/8, merged
@1/8 4C)`` — ``PIDHead`` consumes all three via ``multiple_select``
(train) and the merged map alone (eval); plain FCN heads can ride
``in_index``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...ops.pooling import avg_pool2d
from ...utils.ops import resize
from ..common.conv_module import ConvModule
from .resnet import BasicBlock, Bottleneck, _norm_cfg


class PagFM(nn.Module):
    """Pixel-attention-guided fusion (paper Fig. 4; mmseg ``PagFM``).

    ``out = sigma * up(x_i) + (1 - sigma) * x_p`` with
    ``sigma = sigmoid(<f_p(x_p), up(f_i(x_i))>)`` — the channel dot
    product (or a 1x1-conv map of the elementwise product when
    ``with_channel``).
    """

    in_channels: int
    channels: int
    after_relu: bool = False
    with_channel: bool = False
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None

    def setup(self):
        ncfg = dict(self.norm_cfg or dict(type="BN"))
        kw = dict(norm_cfg=ncfg, act_cfg=None)
        self.f_i = ConvModule(self.in_channels, self.channels, 1, **kw)
        self.f_p = ConvModule(self.in_channels, self.channels, 1, **kw)
        if self.with_channel:
            self.up = ConvModule(self.channels, self.in_channels, 1, **kw)

    def __call__(self, x_p, x_i, train: bool = False):
        if self.after_relu:
            x_p, x_i = nn.relu(x_p), nn.relu(x_i)
        size = x_p.shape[1:3]
        f_i = resize(self.f_i(x_i, train=train), size=size, mode="bilinear",
                     align_corners=self.align_corners)
        f_p = self.f_p(x_p, train=train)
        if self.with_channel:
            sigma = nn.sigmoid(self.up(f_p * f_i, train=train))
        else:
            sigma = nn.sigmoid(jnp.sum(f_p * f_i, axis=-1, keepdims=True))
        x_i = resize(x_i, size=size, mode="bilinear",
                     align_corners=self.align_corners)
        return sigma * x_i + (1 - sigma) * x_p


class PAPPM(nn.Module):
    """Parallel Aggregation PPM (paper Fig. 5; mmseg ``PAPPM``).

    Same pooling pyramid as DAPPM but the four (branch + scale0)
    residuals are refined by ONE grouped 3x3 conv in parallel instead of
    the sequential cascade.  Pre-activation (BN -> ReLU -> conv)
    ordering throughout, as upstream.
    """

    in_channels: int
    branch_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None
    align_corners: bool = False

    def setup(self):
        ncfg = dict(self.norm_cfg or dict(type="BN"))
        kw = dict(norm_cfg=ncfg, act_cfg=dict(type="ReLU"),
                  order=("norm", "act", "conv"))
        bc = self.branch_channels
        self.scale0 = ConvModule(self.in_channels, bc, 1, **kw)
        self.scales = [
            ConvModule(self.in_channels, bc, 1, **kw) for _ in range(4)
        ]
        self.processes = ConvModule(bc * 4, bc * 4, 3, padding=1,
                                    groups=4, **kw)
        self.compression = ConvModule(bc * 5, self.out_channels, 1, **kw)
        self.shortcut = ConvModule(self.in_channels, self.out_channels, 1,
                                   **kw)

    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        x_ = self.scale0(x, train=train)
        pools = [
            avg_pool2d(x, 5, 2, padding=2),
            avg_pool2d(x, 9, 4, padding=4),
            avg_pool2d(x, 17, 8, padding=8),
            jnp.mean(x, axis=(1, 2), keepdims=True),   # global branch
        ]
        feats = [
            resize(scale(pool, train=train), size=size, mode="bilinear",
                   align_corners=self.align_corners) + x_
            for pool, scale in zip(pools, self.scales)
        ]
        scale_out = self.processes(jnp.concatenate(feats, axis=-1),
                                   train=train)
        out = self.compression(jnp.concatenate([x_, scale_out], axis=-1),
                               train=train)
        return out + self.shortcut(x, train=train)


class Bag(nn.Module):
    """Boundary-attention-guided fusion (mmseg ``Bag``): the D branch's
    sigmoid picks P features at boundaries, I features inside."""

    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    def setup(self):
        ncfg = dict(self.norm_cfg or dict(type="BN"))
        self.conv = ConvModule(self.in_channels, self.out_channels, 3,
                               padding=1, norm_cfg=ncfg,
                               act_cfg=dict(type="ReLU"),
                               order=("norm", "act", "conv"))

    def __call__(self, x_p, x_i, x_d, train: bool = False):
        sigma = nn.sigmoid(x_d)
        return self.conv(sigma * x_p + (1 - sigma) * x_i, train=train)


class LightBag(nn.Module):
    """1x1-conv Bag variant used by PIDNet-S (mmseg ``LightBag``)."""

    in_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    def setup(self):
        ncfg = dict(self.norm_cfg or dict(type="BN"))
        kw = dict(norm_cfg=ncfg, act_cfg=None)
        self.f_p = ConvModule(self.in_channels, self.out_channels, 1, **kw)
        self.f_i = ConvModule(self.in_channels, self.out_channels, 1, **kw)

    def __call__(self, x_p, x_i, x_d, train: bool = False):
        sigma = nn.sigmoid(x_d)
        f_p = self.f_p((1 - sigma) * x_i + x_p, train=train)
        f_i = self.f_i(x_i + sigma * x_p, train=train)
        return f_p + f_i


@BACKBONE.register()
class PIDNet(nn.Module):
    """PIDNet-S/M/L three-branch realtime backbone.

    PIDNet-S: ``channels=32, ppm_channels=96, num_stem_blocks=2,
    num_branch_blocks=3`` (LightBag + PAPPM); PIDNet-M: ``channels=64``;
    PIDNet-L: ``channels=64, ppm_channels=112, num_stem_blocks=3,
    num_branch_blocks=4`` (Bag + DAPPM), per the upstream arch table.
    """

    in_channels: int = 3
    channels: int = 32
    ppm_channels: int = 96
    num_stem_blocks: int = 2
    num_branch_blocks: int = 3
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None
    norm_eval: bool = False
    init_cfg: Optional[Any] = None

    def setup(self):
        C = self.channels
        norm_cfg = self.norm_cfg or dict(type="BN", requires_grad=True)
        ncfg = _norm_cfg(norm_cfg, True, self.norm_eval)
        ck = dict(norm_cfg=dict(ncfg), act_cfg=dict(type="ReLU"))
        nk = dict(norm_cfg=dict(ncfg), act_cfg=None)

        def basics(n, cin, cout, stride, name):
            return [BasicBlock(inplanes=cin if j == 0 else cout, planes=cout,
                               stride=stride if j == 0 else 1,
                               norm_cfg=norm_cfg,
                               norm_force_eval=self.norm_eval,
                               name=f"{name}_{j}")
                    for j in range(n)]

        def bottle(n, cin, cout, stride, name):
            # shared expansion-4 Bottleneck at planes = cout // 4 (see
            # module docstring divergence note (b))
            assert cout % 4 == 0, cout
            return [Bottleneck(inplanes=cin if j == 0 else cout,
                               planes=cout // 4,
                               stride=stride if j == 0 else 1,
                               norm_cfg=norm_cfg,
                               norm_force_eval=self.norm_eval,
                               name=f"{name}_{j}")
                    for j in range(n)]

        # stem: two 3x3/s2 convs -> 1/4, then layer1 (C), layer2 (2C @1/8)
        self.stem = [ConvModule(self.in_channels, C, 3, stride=2,
                                padding=1, **ck),
                     ConvModule(C, C, 3, stride=2, padding=1, **ck)]
        self.layer1 = basics(self.num_stem_blocks, C, C, 1, "layer1")
        self.layer2 = basics(self.num_stem_blocks, C, 2 * C, 2, "layer2")

        # I branch: 1/16 -> 1/32 -> 1/64 (Bottleneck x2 to 16C)
        nb = self.num_branch_blocks
        self.i_layer3 = basics(nb, 2 * C, 4 * C, 2, "i_layer3")
        self.i_layer4 = basics(nb, 4 * C, 8 * C, 2, "i_layer4")
        self.i_layer5 = bottle(2, 8 * C, 16 * C, 2, "i_layer5")

        # P branch: stays 1/8 at 2C; stage 5 is one Bottleneck to 4C
        ns = self.num_stem_blocks
        self.p_layer3 = basics(ns, 2 * C, 2 * C, 1, "p_layer3")
        self.p_layer4 = basics(ns, 2 * C, 2 * C, 1, "p_layer4")
        self.p_layer5 = bottle(1, 2 * C, 4 * C, 1, "p_layer5")

        self.compression3 = ConvModule(4 * C, 2 * C, 1, **nk)
        self.compression4 = ConvModule(8 * C, 2 * C, 1, **nk)
        self.pag3 = PagFM(2 * C, C, norm_cfg=dict(ncfg),
                          align_corners=self.align_corners)
        self.pag4 = PagFM(2 * C, C, norm_cfg=dict(ncfg),
                          align_corners=self.align_corners)

        # D branch: thin for -S (C wide, LightBag/PAPPM), 2C for -M/-L
        # (Bag/DAPPM) — the upstream num_stem_blocks==2 switch
        if self.num_stem_blocks == 2:
            self.d_layer3 = basics(1, 2 * C, C, 1, "d_layer3")
            self.d_layer4 = bottle(1, C, 2 * C, 1, "d_layer4")
            spp_cls, bag_cls = PAPPM, LightBag
        else:
            self.d_layer3 = basics(1, 2 * C, 2 * C, 1, "d_layer3")
            self.d_layer4 = basics(1, 2 * C, 2 * C, 1, "d_layer4")
            from .ddrnet import DAPPM
            spp_cls, bag_cls = DAPPM, Bag
        self.d_layer5 = bottle(1, 2 * C, 4 * C, 1, "d_layer5")
        d_width = C if self.num_stem_blocks == 2 else 2 * C
        self.diff3 = ConvModule(4 * C, d_width, 3, padding=1, **nk)
        self.diff4 = ConvModule(8 * C, 2 * C, 3, padding=1, **nk)

        self.spp = spp_cls(16 * C, self.ppm_channels, 4 * C,
                           norm_cfg=dict(ncfg))
        self.dfm = bag_cls(4 * C, 4 * C, norm_cfg=dict(ncfg))

    def _run(self, blocks, x, train):
        for b in blocks:
            x = b(x, train)
        return x

    def __call__(self, x, train: bool = False):
        for conv in self.stem:
            x = conv(x, train=train)
        x = self._run(self.layer1, x, train)
        x = self._run(self.layer2, nn.relu(x), train)

        # stage 3: fork; P gated by compressed I (PagFM), D fed by diff tap
        x_i = self._run(self.i_layer3, nn.relu(x), train)       # 1/16 4C
        x_p = self._run(self.p_layer3, x, train)                # 1/8 2C
        x_d = self._run(self.d_layer3, x, train)                # 1/8
        comp = self.compression3(nn.relu(x_i), train=train)
        x_p = self.pag3(x_p, comp, train=train)
        diff = self.diff3(nn.relu(x_i), train=train)
        x_d = x_d + resize(diff, size=x_d.shape[1:3], mode="bilinear",
                           align_corners=self.align_corners)
        p_tap = x_p                                             # aux head tap

        # stage 4
        x_i = self._run(self.i_layer4, nn.relu(x_i), train)     # 1/32 8C
        x_p = self._run(self.p_layer4, nn.relu(x_p), train)
        x_d = self._run(self.d_layer4, nn.relu(x_d), train)     # 2C
        comp = self.compression4(nn.relu(x_i), train=train)
        x_p = self.pag4(x_p, comp, train=train)
        diff = self.diff4(nn.relu(x_i), train=train)
        x_d = x_d + resize(diff, size=x_d.shape[1:3], mode="bilinear",
                           align_corners=self.align_corners)
        d_tap = x_d                                             # boundary tap

        # stage 5 + PPM context + boundary-guided merge at 1/8
        x_i = self._run(self.i_layer5, nn.relu(x_i), train)     # 1/64 16C
        x_p = self._run(self.p_layer5, nn.relu(x_p), train)     # 4C
        x_d = self._run(self.d_layer5, nn.relu(x_d), train)     # 4C
        ctx = self.spp(x_i, train=train)
        ctx = resize(ctx, size=x_p.shape[1:3], mode="bilinear",
                     align_corners=self.align_corners)
        out = self.dfm(x_p, ctx, x_d, train=train)
        return p_tap, d_tap, out
