"""DDRNet backbone (Hong et al., 2021 — "Deep Dual-Resolution Networks
for Real-time Semantic Segmentation of Road Scenes"; mmseg ``DDRNet``
structure).

Beyond-reference realtime family.  After the shared 1/8 trunk the
network forks into a high-resolution spatial branch (stays at 1/8) and
a context branch (strides on to 1/64); the two exchange information
with *bilateral fusion* after each stage pair (1x1 compression +
bilinear up into the spatial branch; strided 3x3 chain down into the
context branch), and a DAPPM pyramid (cascaded stride-2 avg-pools with
residual refinement) summarizes the 1/64 features before the final
upsample-and-add merge at 1/8.  Everything is 3x3/1x1 conv+BN+ReLU on
the MXU.  Divergence note: the official blocks end stages without a
ReLU (``no_relu``) and rectify at the next stage; this implementation
reuses the standard always-ReLU ``BasicBlock``, so fusion adds see
rectified features (the explicit ``nn.relu`` calls at stage
boundaries are then idempotent) — a documented simplification that
keeps the block zoo shared.

Outputs: ``(aux @1/8 spatial-branch tap, merged 1/8 features)`` —
``out_indices`` selects, FCN heads consume (mmseg convention:
in_index=1 decode, in_index=0 auxiliary).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ...ops.pooling import avg_pool2d
from ...utils.ops import resize
from ..builder import build_norm_layer
from ..common.conv_module import ConvModule
from .resnet import BasicBlock, Bottleneck, _norm_cfg


class DAPPM(nn.Module):
    """Deep Aggregation Pyramid Pooling Module (paper Fig. 5).

    Branch i pools with kernel 2^(i+1)+1 / stride 2^i (plus a global
    branch), 1x1-projects, upsamples, and is refined by a 3x3 conv of
    (branch_i + refined_{i-1}) — a cascade rather than a flat concat.
    Pre-activation (BN → ReLU → conv) ordering throughout, as upstream.
    """

    in_channels: int
    branch_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    def setup(self):
        ncfg = dict(self.norm_cfg or dict(type="BN"))
        kw = dict(norm_cfg=ncfg, act_cfg=dict(type="ReLU"),
                  order=("norm", "act", "conv"))
        bc = self.branch_channels
        self.scale0 = ConvModule(self.in_channels, bc, 1, **kw)
        self.scales = [
            ConvModule(self.in_channels, bc, 1, **kw) for _ in range(4)
        ]
        self.processes = [
            ConvModule(bc, bc, 3, padding=1, **kw) for _ in range(4)
        ]
        self.compression = ConvModule(bc * 5, self.out_channels, 1, **kw)
        self.shortcut = ConvModule(self.in_channels, self.out_channels, 1,
                                   **kw)

    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        outs = [self.scale0(x, train=train)]
        pools = [
            avg_pool2d(x, 5, 2, padding=2),
            avg_pool2d(x, 9, 4, padding=4),
            avg_pool2d(x, 17, 8, padding=8),
            jnp.mean(x, axis=(1, 2), keepdims=True),   # global branch
        ]
        for i, (pool, scale, process) in enumerate(
                zip(pools, self.scales, self.processes)):
            y = resize(scale(pool, train=train), size=size, mode="bilinear",
                       align_corners=False)
            outs.append(process(y + outs[-1], train=train))
        out = self.compression(jnp.concatenate(outs, axis=-1), train=train)
        return out + self.shortcut(x, train=train)


@BACKBONE.register()
class DDRNet(nn.Module):
    """DDRNet-23(-slim): two-branch realtime backbone.

    ``channels=32`` is 23-slim; ``channels=64`` is DDRNet-23.
    """

    in_channels: int = 3
    channels: int = 32                  # stem width C
    ppm_channels: int = 128             # DAPPM branch width
    align_corners: bool = False
    norm_cfg: Optional[Dict] = None
    norm_eval: bool = False
    init_cfg: Optional[Any] = None

    def setup(self):
        C = self.channels
        norm_cfg = self.norm_cfg or dict(type="BN", requires_grad=True)
        ncfg = _norm_cfg(norm_cfg, True, self.norm_eval)
        ck = dict(norm_cfg=dict(ncfg), act_cfg=dict(type="ReLU"))

        # stem: two 3x3/s2 convs → 1/4
        self.stem = [ConvModule(self.in_channels, C, 3, stride=2,
                                padding=1, **ck),
                     ConvModule(C, C, 3, stride=2, padding=1, **ck)]

        def blocks(n, cin, cout, stride, name):
            out = []
            for j in range(n):
                out.append(BasicBlock(
                    inplanes=cin if j == 0 else cout, planes=cout,
                    stride=stride if j == 0 else 1, norm_cfg=norm_cfg,
                    norm_force_eval=self.norm_eval, name=f"{name}_{j}"))
            return out

        # shared trunk: layer1 (1/4), layer2 (1/8)
        self.layer1 = blocks(2, C, C, 1, "layer1")
        self.layer2 = blocks(2, C, 2 * C, 2, "layer2")
        # context branch: layer3 (1/16), layer4 (1/32), layer5 (1/64)
        self.layer3 = blocks(2, 2 * C, 4 * C, 2, "layer3")
        self.layer4 = blocks(2, 4 * C, 8 * C, 2, "layer4")
        self.layer5 = [Bottleneck(inplanes=8 * C, planes=8 * C // 4 * 2,
                                  stride=2, norm_cfg=norm_cfg,
                                  norm_force_eval=self.norm_eval,
                                  name="layer5_0")]
        # spatial branch stays at 1/8, width 2C
        self.layer3_s = blocks(2, 2 * C, 2 * C, 1, "layer3_s")
        self.layer4_s = blocks(2, 2 * C, 2 * C, 1, "layer4_s")
        self.layer5_s = [Bottleneck(inplanes=2 * C, planes=C,
                                    stride=1, norm_cfg=norm_cfg,
                                    norm_force_eval=self.norm_eval,
                                    name="layer5_s_0")]

        # bilateral fusion convs
        nk = dict(norm_cfg=dict(ncfg), act_cfg=None)
        self.compression3 = ConvModule(4 * C, 2 * C, 1, **nk)
        self.compression4 = ConvModule(8 * C, 2 * C, 1, **nk)
        self.down3 = ConvModule(2 * C, 4 * C, 3, stride=2, padding=1, **nk)
        self.down4 = [ConvModule(2 * C, 4 * C, 3, stride=2, padding=1,
                                 norm_cfg=dict(ncfg),
                                 act_cfg=dict(type="ReLU")),
                      ConvModule(4 * C, 8 * C, 3, stride=2, padding=1,
                                 **nk)]

        self.spp = DAPPM(16 * C, self.ppm_channels, 4 * C,
                         norm_cfg=dict(ncfg))
        self.final_compression = ConvModule(4 * C, 4 * C, 1, **nk)

    def _run(self, blocks, x, train):
        for b in blocks:
            x = b(x, train)
        return x

    def __call__(self, x, train: bool = False):
        for conv in self.stem:
            x = conv(x, train=train)
        x = self._run(self.layer1, x, train)
        x = self._run(self.layer2, nn.relu(x), train)

        # stage 3 with bilateral fusion
        xc = self._run(self.layer3, nn.relu(x), train)      # 1/16
        xs = self._run(self.layer3_s, nn.relu(x), train)    # 1/8
        comp = resize(self.compression3(nn.relu(xc), train=train),
                      size=xs.shape[1:3], mode="bilinear",
                      align_corners=self.align_corners)
        down = self.down3(nn.relu(xs), train=train)
        xs, xc = xs + comp, xc + down
        aux = xs                                            # OCR-style tap

        # stage 4 with bilateral fusion
        xc2 = self._run(self.layer4, nn.relu(xc), train)    # 1/32
        xs2 = self._run(self.layer4_s, nn.relu(xs), train)
        comp = resize(self.compression4(nn.relu(xc2), train=train),
                      size=xs2.shape[1:3], mode="bilinear",
                      align_corners=self.align_corners)
        down = self.down4[1](self.down4[0](nn.relu(xs2), train=train),
                             train=train)
        xs2, xc2 = xs2 + comp, xc2 + down

        # stage 5 + DAPPM merge at 1/8
        xs3 = self._run(self.layer5_s, nn.relu(xs2), train)
        xc3 = self._run(self.layer5, nn.relu(xc2), train)   # 1/64, 16C
        ctx = self.spp(xc3, train=train)
        ctx = self.final_compression(ctx, train=train)
        ctx = resize(ctx, size=xs3.shape[1:3], mode="bilinear",
                     align_corners=self.align_corners)
        return aux, xs3 + ctx
