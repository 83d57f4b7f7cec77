"""ResNeXt backbone (Xie et al., CVPR 2017; mmseg ``ResNeXt`` semantics).

Beyond-reference family.  The bottleneck's transform becomes an
aggregated grouped conv: conv1/conv2 widen to
``floor(planes * base_width / base_channels) * groups`` channels and
conv2 runs with ``groups`` feature groups (32x4d: groups=32,
base_width=4 → stage-1 width 128).  On TPU the grouped 3x3 stays one
dense MXU conv with ``feature_group_count`` — no per-group loop.

The width/grouping logic lives directly on the shared ``Bottleneck``
(``models/backbones/resnet.py``), mirroring how mmseg's ResNeXt
Bottleneck overrides only conv1/conv2 construction; this class merely
routes ``groups``/``base_width`` into every block, exactly like
mmseg's ``ResNeXt(ResNet)`` wrapper.  All ResNet machinery —
per-stage strides/dilations, ``multi_grid``, ``contract_dilation``,
``frozen_stages``, ``norm_eval``, remat, V1c/V1d stems via
``deep_stem``/``avg_down`` — composes unchanged.
"""

from __future__ import annotations

from ...core.registry_hub import BACKBONE
from .resnet import Bottleneck, ResNet


@BACKBONE.register()
class ResNeXt(ResNet):
    """mmseg ``ResNeXt``: ResNet with grouped-width bottlenecks."""

    arch_settings = {
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
        152: (Bottleneck, (3, 8, 36, 3)),
    }

    groups: int = 1
    base_width: int = 4

    def _extra_block_kwargs(self):
        return dict(groups=self.groups, base_width=self.base_width,
                    base_channels=self.base_channels)
