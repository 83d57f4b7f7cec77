"""Feature Pyramid Network neck.

The reference declares a NECK registry and an ``EncoderDecoder.neck`` hook
(encoder_decoder.py:53-54, models/builder.py:31) but ships **no** neck
implementation — the registry is empty.  This implements the standard FPN
(arXiv:1612.03144, mmseg parameterization) so the hook is usable: 1x1
lateral convs, top-down nearest-neighbor upsample accumulation, 3x3 output
convs.  Lateral/output 1x1/3x3 convs are MXU work; the top-down adds fuse
into them.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

from flax import linen as nn

from ...core.registry_hub import NECK
from ...utils.ops import resize
from ..common.conv_module import ConvModule

_DEF = object()


@NECK.register()
class FPN(nn.Module):
    in_channels: Sequence[int] = None
    out_channels: int = 256
    num_outs: Optional[int] = None
    start_level: int = 0
    end_level: int = -1
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = None
    init_cfg: Optional[Any] = None

    def setup(self):
        assert isinstance(self.in_channels, (list, tuple))
        end = (len(self.in_channels) if self.end_level == -1
               else self.end_level + 1)
        self.used_levels = list(range(self.start_level, end))
        self.lateral_convs = [
            ConvModule(self.in_channels[i], self.out_channels, 1,
                       conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg)
            for i in self.used_levels
        ]
        self.fpn_convs = [
            ConvModule(self.out_channels, self.out_channels, 3, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg)
            for _ in self.used_levels
        ]

    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels), (
            f"FPN expects {len(self.in_channels)} input levels, "
            f"got {len(inputs)}")
        laterals = [conv(inputs[i], train=train)
                    for conv, i in zip(self.lateral_convs, self.used_levels)]
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            up = resize(laterals[i], size=laterals[i - 1].shape[1:3],
                        mode="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [conv(lat, train=train)
                for conv, lat in zip(self.fpn_convs, laterals)]
        # extra output levels (mmseg FPN semantics with add_extra_convs
        # off): stride-2 max-pool of the last map until num_outs is met
        if self.num_outs is not None:
            assert self.num_outs >= len(outs), (
                f"num_outs={self.num_outs} < {len(outs)} used levels")
            for _ in range(self.num_outs - len(outs)):
                outs.append(nn.max_pool(outs[-1], window_shape=(1, 1),
                                        strides=(2, 2)))
        return tuple(outs)
