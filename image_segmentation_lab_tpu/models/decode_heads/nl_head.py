"""Non-local decode head (NLHead — Wang et al., CVPR 2018; mmseg
``NLHead`` semantics).

Beyond-reference family: an FCN-style head whose bottleneck is a
``NonLocal2d`` pixel-affinity attention block — conv, non-local, conv,
optional concat with the input, classifier.  All the attention math is
batched MXU einsums (see ``models/utils/non_local.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.registry_hub import DECODEHEAD
from ..common.conv_module import ConvModule
from ..utils.non_local import NonLocal2d
from .decode_head import BaseDecodeHead


@DECODEHEAD.register()
class NLHead(BaseDecodeHead):
    reduction: int = 2
    use_scale: bool = True
    mode: str = "embedded_gaussian"
    concat_input: bool = True

    def setup(self):
        super().setup()
        self.convs = [
            ConvModule(self.fused_in_channels, self.channels, 3, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                       act_cfg=self._act_cfg()),
            ConvModule(self.channels, self.channels, 3, padding=1,
                       conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                       act_cfg=self._act_cfg()),
        ]
        self.nl_block = NonLocal2d(self.channels, reduction=self.reduction,
                                   use_scale=self.use_scale, mode=self.mode,
                                   conv_cfg=self.conv_cfg,
                                   norm_cfg=self.norm_cfg)
        if self.concat_input:
            self.conv_cat = ConvModule(
                self.fused_in_channels + self.channels, self.channels, 3,
                padding=1, conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        out = self.convs[0](x, train=train)
        out = self.nl_block(out, train=train)
        out = self.convs[1](out, train=train)
        if self.concat_input:
            out = self.conv_cat(jnp.concatenate([x, out], axis=-1),
                                train=train)
        return self.cls_seg(out, train=train)
