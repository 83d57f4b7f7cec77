"""MultiLevelNeck (mmseg ``MultiLevelNeck``): the "MLN" adapter between
an isotropic ViT backbone and a pyramid decode head (UPerNet's
``upernet_vit-b16_mln`` family).

Beyond-reference addition riding the NECK hook (reference
encoder_decoder.py:53-54 declares the hook; its registry ships empty).
Each same-resolution tap gets a 1x1 lateral projection, is bilinearly
rescaled by its per-level factor (e.g. (4, 2, 1, 0.5) turns four
stride-16 taps into a 4/8/16/32 pyramid), then refined by a 3x3 conv.
A single input is broadcast across all scales (upstream single-tap
mode).  Versus ``Feature2Pyramid`` (BEiT's neck) the upsampling is a
resize instead of learned deconvs.

TPU notes: the bilinear rescales are the separable-matmul resize
(`utils/ops.py`); laterals and refines are 1x1/3x3 MXU convs, and with
``norm_cfg=None, act_cfg=None`` (upstream defaults) each level is two
convs + one resize — XLA fuses the chain per level.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

from flax import linen as nn

from ...core.registry_hub import NECK
from ...utils.ops import resize
from ..common.conv_module import ConvModule


@NECK.register()
class MultiLevelNeck(nn.Module):
    in_channels: Sequence[int] = None
    out_channels: int = 256
    scales: Sequence[float] = (0.5, 1, 2, 4)
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = None
    init_cfg: Optional[Any] = None

    def setup(self):
        assert isinstance(self.in_channels, (list, tuple))
        self.lateral_convs = [
            ConvModule(c, self.out_channels, 1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg)
            for c in self.in_channels
        ]
        self.convs = [
            ConvModule(self.out_channels, self.out_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg)
            for _ in self.scales
        ]

    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels), (
            f"MultiLevelNeck expects {len(self.in_channels)} input "
            f"levels, got {len(inputs)}")
        feats = [conv(x, train=train)
                 for conv, x in zip(self.lateral_convs, inputs)]
        if len(feats) == 1:  # single-tap broadcast (upstream semantics)
            feats = [feats[0]] * len(self.scales)
        outs = []
        for feat, scale, conv in zip(feats, self.scales, self.convs):
            if scale != 1:
                feat = resize(feat, scale_factor=scale, mode="bilinear",
                              align_corners=False)
            outs.append(conv(feat, train=train))
        return tuple(outs)
