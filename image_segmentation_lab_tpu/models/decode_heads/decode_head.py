"""BaseDecodeHead.

Parity target: reference ``models/decode_heads/decode_head.py`` (321 LoC):

* in_channels/in_index/input_transform contract — None / 'resize_concat' /
  'multiple_select' (:147-210);
* binary segmentation: ``out_channels==1`` + threshold default 0.3 (:102-124);
* ``loss_decode`` as a dict or list of losses summed per shared ``loss_name``
  (:126-134, :279-293);
* optional pixel sampler (OHEM) weighting (:136-139, :272-275);
* ``conv_seg`` 1x1 classifier with Dropout2d and NormalInit std=0.01 default
  (:89, :141-145) — baked in as the conv's initializer;
* ``losses()``: resize logits to label size, per-loss + ``acc_seg``, then
  optional rescale to ``ori_img_size_hw`` (tuple = uniform batch; list =
  per-image) (:261-321);
* ``forward_train`` returns ``(seg_logits, losses)`` (:217-235).

Layout: features/logits are channels-last; labels are (N, H, W) int.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...core.builder import SAMPLER, build_from_cfg
from ...core.initialize.init_functions import constant_, normal_
from ...utils.ops import resize
from ..basic.convolution import Conv2d
from ..basic.drop import Dropout2d
from ..builder import build_loss
from ..losses import accuracy

DEFAULT_ACT = object()
_DEFAULT_LOSS = object()

# single source of truth for the binary-segmentation threshold default
# (reference decode_head.py:119-121); train_state.head_threshold reads it too
DEFAULT_BINARY_THRESHOLD = 0.3


class BaseDecodeHead(nn.Module):
    in_channels: Union[int, Sequence[int]] = None
    channels: int = None
    num_classes: int = None
    out_channels: Optional[int] = None
    threshold: Optional[float] = None
    dropout_ratio: float = 0.1
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = DEFAULT_ACT
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None
    loss_decode: Any = _DEFAULT_LOSS
    ignore_index: int = 255
    sampler: Optional[Dict] = None
    align_corners: bool = False
    init_cfg: Optional[Any] = None

    # ---- pure helpers usable on unbound modules (EncoderDecoder reads these)
    def resolved_out_channels(self) -> int:
        if self.out_channels is None:
            return self.num_classes
        if self.out_channels != self.num_classes and self.out_channels != 1:
            raise ValueError(
                "out_channels should equal num_classes, except binary "
                f"segmentation with out_channels == 1; got "
                f"out_channels={self.out_channels}, num_classes={self.num_classes}")
        return self.out_channels

    def resolved_threshold(self) -> float:
        return (DEFAULT_BINARY_THRESHOLD if self.threshold is None
                else self.threshold)

    def _act_cfg(self):
        return {"type": "ReLU"} if self.act_cfg is DEFAULT_ACT else self.act_cfg

    def _check_inputs(self):
        """Validate the (in_channels, in_index, input_transform) triple
        (reference decode_head.py:147-210)."""
        if self.input_transform is not None:
            assert self.input_transform in ("resize_concat", "multiple_select")
            assert isinstance(self.in_channels, (list, tuple))
            assert isinstance(self.in_index, (list, tuple))
            assert len(self.in_channels) == len(self.in_index)
        else:
            assert isinstance(self.in_channels, int)
            assert isinstance(self.in_index, int)

    @property
    def fused_in_channels(self) -> int:
        """in_channels after input transform."""
        if self.input_transform == "resize_concat":
            return sum(self.in_channels)
        return self.in_channels

    def setup(self):
        assert self.num_classes is not None, "num_classes is required"
        self._check_inputs()
        out_ch = self.resolved_out_channels()

        losses_cfg = self.loss_decode
        if losses_cfg is _DEFAULT_LOSS:
            losses_cfg = dict(type="CrossEntropyLoss", use_sigmoid=False,
                              loss_weight=1.0)
        from collections.abc import Mapping
        if isinstance(losses_cfg, Mapping):
            self.losses_decode = (build_loss(losses_cfg),)
        elif isinstance(losses_cfg, (list, tuple)):
            self.losses_decode = tuple(build_loss(l) for l in losses_cfg)
        else:
            raise TypeError(
                f"loss_decode must be a dict or sequence of dict, "
                f"but got {type(losses_cfg)}")

        if self.sampler is not None:
            self.pixel_sampler = build_from_cfg(self.sampler, SAMPLER)
        else:
            self.pixel_sampler = None

        self.conv_seg = Conv2d(self.channels, out_ch, 1,
                               weight_init=normal_(0, 0.01),
                               bias_init=constant_(0.0))
        if self.dropout_ratio > 0:
            self.dropout = Dropout2d(self.dropout_ratio)
        else:
            self.dropout = None

    def _transform_inputs(self, inputs):
        """Select / fuse backbone features (reference decode_head.py:185-210)."""
        if self.input_transform == "resize_concat":
            selected = [inputs[i] for i in self.in_index]
            upsampled = [resize(x, size=selected[0].shape[1:3],
                                mode="bilinear",
                                align_corners=self.align_corners)
                         for x in selected]
            return jnp.concatenate(upsampled, axis=-1)
        if self.input_transform == "multiple_select":
            return [inputs[i] for i in self.in_index]
        if not isinstance(inputs, (list, tuple)):
            # single-tap backbones (out_indices of length 1) return the
            # bare feature map, mirroring the reference convention
            # (reference mobilenet_v2.py:117-119); indexing it with
            # in_index would slice the batch axis
            return inputs
        return inputs[self.in_index]

    def __call__(self, inputs, train: bool = False):
        raise NotImplementedError

    def cls_seg(self, feat, train: bool = False):
        """Dropout + 1x1 classifier (reference decode_head.py:254-259)."""
        if self.dropout is not None:
            feat = self.dropout(feat, train=train)
        return self.conv_seg(feat, train=train)

    def forward_train(self, inputs, gt_semantic_seg, meta_infos=None,
                      rescale: bool = False, train: bool = True):
        seg_logits = self(inputs, train=train)
        seg_logits, losses = self.losses(seg_logits, gt_semantic_seg,
                                         meta_infos, rescale=rescale)
        return seg_logits, losses

    def forward_test(self, inputs, train: bool = False):
        return self(inputs, train=train)

    def losses(self, seg_logit, seg_label, meta_infos=None,
               rescale: bool = False):
        """Resize-to-label + per-loss + accuracy + optional ori-size rescale
        (reference decode_head.py:261-321).

        seg_label: (N, H, W) int.  Returns (rescaled_logits, loss_dict).
        """
        loss = dict()
        seg_logit = resize(seg_logit, size=seg_label.shape[1:3],
                           mode="bilinear", align_corners=self.align_corners)
        if self.pixel_sampler is not None:
            seg_weight = self.pixel_sampler.sample(self, seg_logit, seg_label)
        else:
            seg_weight = None

        for loss_decode in self.losses_decode:
            value = loss_decode(seg_logit, seg_label, weight=seg_weight,
                                ignore_index=self.ignore_index)
            if loss_decode.loss_name not in loss:
                loss[loss_decode.loss_name] = value
            else:
                loss[loss_decode.loss_name] += value

        acc_logit = seg_logit
        if seg_logit.shape[-1] == 1:
            # binary head: argmax over one channel would always report the
            # background fraction (latent reference defect); pair the logit
            # with the threshold so accuracy reflects sigmoid(x) > threshold
            import math
            t = self.resolved_threshold()
            thr_logit = math.log(t / max(1.0 - t, 1e-8))
            acc_logit = jnp.concatenate(
                [jnp.full_like(seg_logit, thr_logit), seg_logit], axis=-1)
        loss["acc_seg"] = accuracy(acc_logit, seg_label,
                                   ignore_index=self.ignore_index)

        ori_img_size = (meta_infos or {}).get("ori_img_size_hw", None)
        if rescale and ori_img_size:
            if isinstance(ori_img_size, tuple):
                rescaled = resize(seg_logit, size=ori_img_size,
                                  mode="bilinear",
                                  align_corners=self.align_corners)
            elif isinstance(ori_img_size, list):
                assert len(seg_logit) == len(ori_img_size)
                rescaled = [
                    resize(seg_logit[i][None], size=tuple(s), mode="bilinear",
                           align_corners=self.align_corners)
                    for i, s in enumerate(ori_img_size)
                ]
            else:
                raise TypeError(f"bad ori_img_size_hw {ori_img_size!r}")
        else:
            rescaled = seg_logit
        return rescaled, loss
