"""CascadeEncoderDecoder.

Parity target: reference ``models/segmentors/cascade_encoder_decoder.py``
(97 LoC): ``decode_head`` is a list of ``num_stages`` heads; stage k>0
receives the backbone features plus the previous stage's logits
(``encode_decode`` chains them, :61-73; training runs every stage's loss,
:75-97).  The reference calls the heads with stale mmseg signatures that no
longer exist (SURVEY.md §8.6); this implements the cascade against the real
head API.  Stage-k heads must accept ``prev_logits`` — ``OCR``-style heads
would; for plain heads the previous logits are passed by feature concat via
``cascade_input='concat'`` or ignored with ``cascade_input='features'``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from ...core.registry_hub import BACKBONE, DECODEHEAD, NECK, SEGMENTOR
from ...utils.ops import add_prefix, resize
from ..builder import build_module_from_cfg
from .encoder_decoder import EncoderDecoder


@SEGMENTOR.register()
class CascadeEncoderDecoder(EncoderDecoder):
    num_stages: int = 2
    # how stage k>0 consumes the previous stage's logits:
    #   'features' — ignore them (pure refinement stack on shared features)
    #   'concat'   — concat prev logits onto the head's selected input
    cascade_input: str = "concat"

    def setup(self):
        assert isinstance(self.decode_head, (list, tuple)), (
            "CascadeEncoderDecoder needs decode_head to be a list of "
            f"{self.num_stages} head cfgs")
        assert len(self.decode_head) == self.num_stages
        assert self.cascade_input in ("features", "concat")
        self.stage_heads = [
            build_module_from_cfg(cfg, DECODEHEAD,
                                  dict(name=f"decode_head_{i}"))
            for i, cfg in enumerate(self.decode_head)
        ]
        self.backbone_module = build_module_from_cfg(
            self.backbone, BACKBONE, dict(name="backbone"))
        self.neck_module = None
        if self.neck is not None:
            self.neck_module = build_module_from_cfg(self.neck, NECK,
                                                     dict(name="neck"))
        if self.with_aux and self.auxiliary_head:
            if isinstance(self.auxiliary_head, (list, tuple)):
                self.aux_head_modules = [
                    build_module_from_cfg(cfg, DECODEHEAD,
                                          dict(name=f"auxiliary_head_{i}"))
                    for i, cfg in enumerate(self.auxiliary_head)
                ]
            else:
                self.aux_head_modules = build_module_from_cfg(
                    self.auxiliary_head, DECODEHEAD,
                    dict(name="auxiliary_head"))
        else:
            self.aux_head_modules = None
        last = self.stage_heads[-1]
        self.decode_head_module = last
        self.align_corners = last.align_corners
        self.num_classes = last.num_classes
        self.out_channels = last.resolved_out_channels()

    def _stage_inputs(self, inputs, head, prev_logits, train):
        if prev_logits is None or self.cascade_input == "features" \
                or getattr(head, "takes_prev_logits", False):
            return inputs
        # resize prev logits onto the head's selected feature and concat
        idx = head.in_index if isinstance(head.in_index, int) else \
            head.in_index[0]
        target = inputs[idx]
        prev = resize(prev_logits, size=target.shape[1:3], mode="bilinear",
                      align_corners=head.align_corners)
        patched = list(inputs)
        patched[idx] = jnp.concatenate([target, prev], axis=-1)
        return patched

    def encode_decode(self, img, train: bool = False):
        """Chained stage heads (reference cascade_encoder_decoder.py:61-73)."""
        x = self.extract_feat(img, train=train)
        out = self.stage_heads[0].forward_test(x, train=train)
        for i in range(1, self.num_stages):
            head = self.stage_heads[i]
            if getattr(head, "takes_prev_logits", False):
                # OCR-style heads consume the previous stage's logits as a
                # separate argument (soft region map), not a feature concat
                out = head(x, train=train, prev_logits=out)
            else:
                out = head.forward_test(
                    self._stage_inputs(x, head, out, train), train=train)
        return resize(out, size=img.shape[1:3], mode="bilinear",
                      align_corners=self.align_corners)

    def forward_train(self, img, gt_semantic_seg, meta_infos=None,
                      rescale: bool = False, train: bool = True):
        x = self.extract_feat(img, train=train)
        seg_logits, losses = {}, {}

        prev = None
        for i, head in enumerate(self.stage_heads):
            inputs = self._stage_inputs(x, head, prev, train)
            if prev is not None and getattr(head, "takes_prev_logits",
                                            False):
                raw = head(inputs, train=train, prev_logits=prev)
            else:
                raw = head(inputs, train=train)  # feature-resolution logits
            logit, loss = head.losses(raw, gt_semantic_seg, meta_infos,
                                      rescale=rescale)
            prefix = "decode" if i == self.num_stages - 1 else f"decode_{i}"
            losses.update(add_prefix(loss, prefix))
            seg_logits[prefix] = logit
            prev = raw

        if self.with_auxiliary_head:
            if isinstance(self.aux_head_modules, (list, tuple)):
                for idx, aux_head in enumerate(self.aux_head_modules):
                    logit, loss_aux = aux_head.forward_train(
                        x, gt_semantic_seg, meta_infos, rescale=rescale,
                        train=train)
                    losses.update(add_prefix(loss_aux, f"aux_{idx}"))
                    seg_logits[f"aux_{idx}"] = logit
            else:
                logit, loss_aux = self.aux_head_modules.forward_train(
                    x, gt_semantic_seg, meta_infos, rescale=rescale,
                    train=train)
                losses.update(add_prefix(loss_aux, "aux"))
                seg_logits["aux"] = logit
        return seg_logits, losses
