"""DDRHead (official DDRNet ``segmenthead`` pair; mmseg ``DDRHead``
semantics): the two-logit head for the DDRNet backbone.

Beyond-reference addition.  Consumes the backbone's ``(aux_1/8, fused_1/8)``
pair: at eval only the fused context features run through the pre-activation
segmenthead block (BN-ReLU-3x3-BN-ReLU then the 1x1 classifier, shared with
PIDHead's ``_BasePIDHead``); in training the stage-3 spatial tap (half the
fused width) gets its own segmenthead, with the upstream two-loss
arrangement:

* ``loss_context`` — loss_decode[0] on the fused logits (typically OHEM CE);
* ``loss_spatial`` — loss_decode[1] on the spatial-tap logits (0.4x weight
  in the upstream recipe, carried by the loss cfg's ``loss_weight``).

Both logit maps bilinear-resize to the label grid before the loss, exactly
like the upstream ``loss_by_feat``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from ..losses import accuracy
from .decode_head import BaseDecodeHead
from .pid_head import _BasePIDHead


@DECODEHEAD.register()
class DDRHead(BaseDecodeHead):
    """in_channels = fused context width (4C); the spatial tap is
    in_channels//2 wide (2C) per the DDRNet backbone contract."""

    def setup(self):
        super().setup()
        assert len(self.losses_decode) == 2, (
            "DDRHead needs loss_decode=[context, spatial], got "
            f"{len(self.losses_decode)}")
        ncfg = dict(self.norm_cfg or dict(type="BN"))
        out_ch = self.resolved_out_channels()
        self.context_head = _BasePIDHead(self.in_channels, self.channels,
                                         out_ch, norm_cfg=ncfg)
        self.spatial_head = _BasePIDHead(self.in_channels // 2,
                                         self.channels, out_ch,
                                         norm_cfg=ncfg)

    def __call__(self, inputs, train: bool = False):
        # eval path: fused context features only (upstream forward eval arm)
        x = inputs[-1] if isinstance(inputs, (list, tuple)) else inputs
        return self.context_head(x, train=train)

    def forward_train(self, inputs, gt_semantic_seg, meta_infos=None,
                      rescale: bool = False, train: bool = True):
        assert isinstance(inputs, (list, tuple)) and len(inputs) == 2, (
            "DDRHead expects the DDRNet (spatial_tap, fused) pair")
        c3_feat, c5_feat = inputs
        logit_c = self.context_head(c5_feat, train=train)
        logit_s = self.spatial_head(c3_feat, train=train)

        label = gt_semantic_seg
        up = dict(size=label.shape[1:3], mode="bilinear",
                  align_corners=self.align_corners)
        logit_c = resize(logit_c, **up)
        logit_s = resize(logit_s, **up)

        ctx_loss, sp_loss = self.losses_decode
        loss = dict()
        loss["loss_context"] = ctx_loss(logit_c, label,
                                        ignore_index=self.ignore_index)
        loss["loss_spatial"] = sp_loss(logit_s, label,
                                       ignore_index=self.ignore_index)
        loss["acc_seg"] = accuracy(logit_c, label,
                                   ignore_index=self.ignore_index)

        ori_img_size = (meta_infos or {}).get("ori_img_size_hw", None)
        if rescale and ori_img_size and isinstance(ori_img_size, tuple):
            logit_c = resize(logit_c, size=ori_img_size, mode="bilinear",
                             align_corners=self.align_corners)
        return logit_c, loss
