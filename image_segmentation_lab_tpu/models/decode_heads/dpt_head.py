"""DPT decode head (Dense Prediction Transformer — Ranftl et al.,
ICCV 2021; mmseg ``DPTHead`` semantics).

Beyond-reference family pairing the ViT backbone's
``output_cls_token=True`` mode: ReassembleBlocks lift four isotropic
transformer taps to a pyramid (1x1 proj + {4x deconv, 2x deconv,
identity, stride-2 conv}) with optional cls-token readout fusion;
FeatureFusionBlocks then merge the pyramid top-down through
pre-activation residual conv units and 2x bilinear upsampling.  The
deconvs ride the torch-exact ``ConvTranspose2d`` (input-dilated MXU
conv); everything else is ordinary ConvModule machinery.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from ..basic.convolution import Conv2d, ConvTranspose2d, Linear
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


class ReassembleBlocks(nn.Module):
    """mmseg ``ReassembleBlocks``: readout fusion + proj + rescale."""

    in_channels: int = 768
    out_channels: Sequence[int] = (96, 192, 384, 768)
    readout_type: str = "ignore"
    patch_size: int = 16

    def setup(self):
        assert self.readout_type in ("ignore", "add", "project")
        oc = self.out_channels
        assert len(oc) == 4
        self.projects = [ConvModule(self.in_channels, c, 1, act_cfg=None)
                         for c in oc]
        self.resize_layers = [
            ConvTranspose2d(oc[0], oc[0], 4, stride=4),
            ConvTranspose2d(oc[1], oc[1], 2, stride=2),
            None,                                        # identity
            Conv2d(oc[3], oc[3], 3, stride=2, padding=1),
        ]
        if self.readout_type == "project":
            self.readout_projects = [
                Linear(2 * self.in_channels, self.in_channels)
                for _ in range(4)
            ]

    def __call__(self, inputs, train: bool = False):
        outs = []
        for i, pair in enumerate(inputs):
            assert isinstance(pair, (tuple, list)) and len(pair) == 2, \
                "DPT needs (feature map, cls token) pairs — set the ViT's " \
                "output_cls_token=True"
            x, cls_token = pair
            N, H, W, C = x.shape
            if self.readout_type == "project":
                t = x.reshape(N, H * W, C)
                readout = jnp.broadcast_to(cls_token[:, None], t.shape)
                t = self.readout_projects[i](
                    jnp.concatenate([t, readout], axis=-1))
                x = nn.gelu(t, approximate=False).reshape(N, H, W, C)
            elif self.readout_type == "add":
                x = x + cls_token[:, None, None, :]
            x = self.projects[i](x, train=train)
            if self.resize_layers[i] is not None:
                x = self.resize_layers[i](x)
            outs.append(x)
        return outs


class PreActResidualConvUnit(nn.Module):
    """act → conv → norm, twice, residual (mmseg order=('act','conv',
    'norm'))."""

    in_channels: int
    act_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    stride: int = 1
    dilation: int = 1

    def setup(self):
        kw = dict(norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                  bias=False, order=("act", "conv", "norm"))
        self.conv1 = ConvModule(self.in_channels, self.in_channels, 3,
                                stride=self.stride,
                                padding=self.dilation,
                                dilation=self.dilation, **kw)
        self.conv2 = ConvModule(self.in_channels, self.in_channels, 3,
                                padding=1, **kw)

    def __call__(self, x, train: bool = False):
        return x + self.conv2(self.conv1(x, train=train), train=train)


class FeatureFusionBlock(nn.Module):
    """Top-down fusion: residual units + 2x upsample + 1x1 project."""

    in_channels: int
    act_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    expand: bool = False
    align_corners: bool = False
    with_unit1: bool = True

    def setup(self):
        out = self.in_channels // 2 if self.expand else self.in_channels
        self.project = ConvModule(self.in_channels, out, 1, act_cfg=None)
        if self.with_unit1:
            self.res_conv_unit1 = PreActResidualConvUnit(
                self.in_channels, self.act_cfg, self.norm_cfg)
        self.res_conv_unit2 = PreActResidualConvUnit(
            self.in_channels, self.act_cfg, self.norm_cfg)

    def __call__(self, x, skip=None, train: bool = False):
        if skip is not None:
            assert self.with_unit1
            if x.shape != skip.shape:
                skip = resize(skip, size=x.shape[1:3], mode="bilinear",
                              align_corners=False)
            x = x + self.res_conv_unit1(skip, train=train)
        x = self.res_conv_unit2(x, train=train)
        x = resize(x, size=(2 * x.shape[1], 2 * x.shape[2]),
                   mode="bilinear", align_corners=self.align_corners)
        return self.project(x, train=train)


@DECODEHEAD.register()
class DPTHead(BaseDecodeHead):
    """mmseg ``DPTHead``: reassemble → per-level 3x3 → top-down fusion."""

    embed_dims: int = 768
    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    readout_type: str = "ignore"
    patch_size: int = 16
    expand_channels: bool = False

    def setup(self):
        super().setup()
        self.reassemble_blocks = ReassembleBlocks(
            self.embed_dims, self.post_process_channels, self.readout_type,
            self.patch_size)
        ppc = [c * 2 ** i if self.expand_channels else c
               for i, c in enumerate(self.post_process_channels)]
        self.convs = [ConvModule(c, self.channels, 3, padding=1,
                                 act_cfg=None, bias=False) for c in ppc]
        self.fusion_blocks = [
            FeatureFusionBlock(self.channels, self._act_cfg(),
                               self.norm_cfg,
                               align_corners=self.align_corners,
                               with_unit1=(i != 0))
            for i in range(len(ppc))
        ]
        self.project = ConvModule(self.channels, self.channels, 3,
                                  padding=1, norm_cfg=self.norm_cfg)

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        x = self.reassemble_blocks(x, train=train)
        x = [conv(f, train=train) for conv, f in zip(self.convs, x)]
        out = self.fusion_blocks[0](x[-1], train=train)
        for i in range(1, len(self.fusion_blocks)):
            out = self.fusion_blocks[i](out, x[-(i + 1)], train=train)
        out = self.project(out, train=train)
        return self.cls_seg(out, train=train)
