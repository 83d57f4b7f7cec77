"""MobileNetV3 backbone (reference ``models/backbones/mobilenet_v3.py``).

small/large arch tables (:53-80), HSwish stem with Conv2dAdaptivePadding
(:144-153), SE with the (ReLU, HSigmoid(3,6)) pair (:166-173), and the
dilated segmentation variant.  The reference creates that variant by
*mutating* stride/dilation/padding of already-built torch convs
(:209-251 — SURVEY.md §7 hard part (e)); immutably-constructed linen modules
can't be patched, so the same per-layer overrides are computed **up front**
in ``_layer_overrides`` and passed declaratively — identical resulting
geometry, and the intent is explicit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

from flax import linen as nn

from ...core.registry_hub import BACKBONE
from ..common.conv_module import ConvModule
from ..utils.inverted_residual import InvertedResidualV3

_DEF = object()


@BACKBONE.register()
class MobileNetV3(nn.Module):
    # [kernel, mid_channels, out_channels, with_se, act, stride]
    arch_settings = {
        "small": [[3, 16, 16, True, "ReLU", 2],
                  [3, 72, 24, False, "ReLU", 2],
                  [3, 88, 24, False, "ReLU", 1],
                  [5, 96, 40, True, "HSwish", 2],
                  [5, 240, 40, True, "HSwish", 1],
                  [5, 240, 40, True, "HSwish", 1],
                  [5, 120, 48, True, "HSwish", 1],
                  [5, 144, 48, True, "HSwish", 1],
                  [5, 288, 96, True, "HSwish", 2],
                  [5, 576, 96, True, "HSwish", 1],
                  [5, 576, 96, True, "HSwish", 1]],
        "large": [[3, 16, 16, False, "ReLU", 1],
                  [3, 64, 24, False, "ReLU", 2],
                  [3, 72, 24, False, "ReLU", 1],
                  [5, 72, 40, True, "ReLU", 2],
                  [5, 120, 40, True, "ReLU", 1],
                  [5, 120, 40, True, "ReLU", 1],
                  [3, 240, 80, False, "HSwish", 2],
                  [3, 200, 80, False, "HSwish", 1],
                  [3, 184, 80, False, "HSwish", 1],
                  [3, 184, 80, False, "HSwish", 1],
                  [3, 480, 112, True, "HSwish", 1],
                  [3, 672, 112, True, "HSwish", 1],
                  [5, 672, 160, True, "HSwish", 2],
                  [5, 960, 160, True, "HSwish", 1],
                  [5, 960, 160, True, "HSwish", 1]],
    }

    arch: str = "small"
    conv_cfg: Optional[Dict] = None
    norm_cfg: Any = _DEF
    out_indices: Sequence[int] = (0, 1, 12)
    frozen_stages: int = -1
    reduction_factor: int = 1
    norm_eval: bool = False
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def _layer_overrides(self, i: int, orig_stride: int):
        """(stride, dilation, force_adaptive) for 1-based layer index ``i`` —
        the declarative form of the reference's conv surgery
        (mobilenet_v3.py:209-251)."""
        if self.arch == "small":
            dil_start, dil4_start, stride_fix = 4, 9, (4, 9)
        else:
            dil_start, dil4_start, stride_fix = 7, 13, (7, 13)
        stride = 1 if i in stride_fix else orig_stride
        dilation = 1
        if i >= dil_start:
            dilation = 2 if i < dil4_start else 4
        force_adaptive = i in stride_fix  # was built stride-2 adaptive
        return stride, dilation, force_adaptive

    def setup(self):
        assert self.arch in self.arch_settings
        assert isinstance(self.reduction_factor, int) \
            and self.reduction_factor > 0
        settings = self.arch_settings[self.arch]
        n_layers = len(settings) + 2
        for index in self.out_indices:
            if index not in range(0, n_layers):
                raise ValueError(f"the item in out_indices must in "
                                 f"range(0, {n_layers}). But received {index}")
        if self.frozen_stages not in range(-1, n_layers):
            raise ValueError(f"frozen_stages must be in range(-1, "
                             f"{n_layers}). But received {self.frozen_stages}")
        norm_cfg = dict(type="BN") if self.norm_cfg is _DEF else self.norm_cfg

        from .resnet import _norm_cfg  # shared freeze/force-eval logic

        def ncfg_for(idx):
            trainable = idx > self.frozen_stages
            return _norm_cfg(norm_cfg, trainable,
                             self.norm_eval or not trainable), trainable

        layers = []
        in_channels = 16
        cfg0, t0 = ncfg_for(0)
        layers.append(ConvModule(
            3, in_channels, 3, stride=2, padding=1,
            conv_cfg=dict(type="Conv2dAdaptivePadding"), norm_cfg=cfg0,
            act_cfg=dict(type="HSwish"), trainable=t0))

        for i, (k, mid, out, with_se, act, stride) in enumerate(settings):
            idx = i + 1
            if (self.arch == "large" and i >= 12) or (
                    self.arch == "small" and i >= 8):
                mid = mid // self.reduction_factor
                out = out // self.reduction_factor
            se_cfg = None
            if with_se:
                se_cfg = dict(channels=mid, ratio=4,
                              act_cfg=(dict(type="ReLU"),
                                       dict(type="HSigmoid", bias=3.0,
                                            divisor=6.0)))
            eff_stride, dilation, force_adaptive = self._layer_overrides(
                idx, stride)
            ncfg, trainable = ncfg_for(idx)
            layers.append(InvertedResidualV3(
                in_channels=in_channels, out_channels=out, mid_channels=mid,
                kernel_size=k, stride=eff_stride, dilation=dilation,
                se_cfg=se_cfg, with_expand_conv=(in_channels != mid),
                conv_cfg=self.conv_cfg, norm_cfg=ncfg,
                act_cfg=dict(type=act), with_cp=self.with_cp,
                trainable=trainable, force_adaptive_padding=force_adaptive))
            in_channels = out

        # final 1x1 HSwish conv (dilation applies trivially to 1x1)
        last_idx = len(settings) + 1
        ncfg, trainable = ncfg_for(last_idx)
        layers.append(ConvModule(
            in_channels, 576 if self.arch == "small" else 960, 1, stride=1,
            dilation=4, padding=0, conv_cfg=self.conv_cfg, norm_cfg=ncfg,
            act_cfg=dict(type="HSwish"), trainable=trainable))
        self.layers = layers

    def __call__(self, x, train: bool = False):
        outs = []
        for i, layer in enumerate(self.layers):
            x = layer(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
