"""EncoderDecoder segmentor.

Parity target: reference ``models/segmentors/encoder_decoder.py`` (353 LoC):
constructor building backbone/neck/heads from cfg with ``pretrained`` →
PretrainedInit (:43-63), aux-head lists (:72-80), ``encode_decode`` =
extract→decode→bilinear-resize-to-input (:89-98), ``forward_train`` returning
``({'decode':…, 'aux':…}, {'decode.loss_ce':…, 'aux.…'})`` (:146-183),
whole/slide inference (:186-253), sigmoid/softmax output + argmax/threshold
simple_test (:255-303), TTA ``batch_test``/``aug_test_logits`` (:314-353).

TPU-native redesign of **slide inference** (the reference's hot loop #3,
SURVEY.md §3.3): instead of a Python double loop of per-window forward
passes, the static window grid is computed at trace time, all windows are
gathered into one big batch (windows × batch) and decoded in a *single*
batched ``encode_decode`` call — the MXU sees one large conv workload instead
of many small ones — then logits are scatter-added back and normalized by a
*constant* count map folded in at compile time.  Two known reference defects
are fixed deliberately (SURVEY.md §8.7): ``batch_test`` no longer skips image
0, and TTA averaging uses all augmentations.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.registry_hub import BACKBONE, DECODEHEAD, NECK, SEGMENTOR
from ...utils.ops import add_prefix, resize
from ..builder import build_module_from_cfg
from .base import BaseSegmentor


def slide_window_origins(h_img: int, w_img: int, h_crop: int, w_crop: int,
                         h_stride: int, w_stride: int):
    """Static edge-clamped window grid (reference encoder_decoder.py:199-208).

    Shared by single-chip slide inference and the window-sharded multi-chip
    path in ``parallel/slide.py``.
    """
    h_crop, w_crop = min(h_crop, h_img), min(w_crop, w_img)
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    origins = []
    for h_idx in range(h_grids):
        for w_idx in range(w_grids):
            y1 = min(h_idx * h_stride + h_crop, h_img) - h_crop
            x1 = min(w_idx * w_stride + w_crop, w_img) - w_crop
            origins.append((max(y1, 0), max(x1, 0)))
    return origins, h_crop, w_crop


def gather_windows(img, origins, h_crop: int, w_crop: int):
    """Stack all slide windows into one (n_win·N, h_crop, w_crop, C) batch."""
    N, _, _, C = img.shape
    crops = [jax.lax.dynamic_slice(img, (0, y1, x1, 0), (N, h_crop, w_crop, C))
             for (y1, x1) in origins]
    return jnp.concatenate(crops, axis=0)


def stitch_windows(crop_logits, origins, h_crop: int, w_crop: int,
                   batch_size: int, h_img: int, w_img: int):
    """Overlap-average window logits back onto the full canvas
    (scatter-add + compile-time count-map normalization)."""
    out_ch = crop_logits.shape[-1]
    preds = jnp.zeros((batch_size, h_img, w_img, out_ch), crop_logits.dtype)
    count = np.zeros((1, h_img, w_img, 1), np.float32)
    for i, (y1, x1) in enumerate(origins):
        logit = crop_logits[i * batch_size:(i + 1) * batch_size]
        preds = preds.at[:, y1:y1 + h_crop, x1:x1 + w_crop, :].add(logit)
        count[:, y1:y1 + h_crop, x1:x1 + w_crop, :] += 1
    assert (count == 0).sum() == 0  # full coverage (static check)
    return preds * jnp.asarray(1.0 / count)


@SEGMENTOR.register()
class EncoderDecoder(BaseSegmentor):
    backbone: Dict = None
    decode_head: Dict = None
    neck: Optional[Dict] = None
    auxiliary_head: Optional[Any] = None
    with_aux: bool = True
    train_cfg: Optional[Dict] = None
    test_cfg: Optional[Dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[Any] = None

    def setup(self):
        assert not (self.init_cfg and self.pretrained), \
            "init_cfg and pretrained cannot be setting at the same time"
        assert self.backbone is not None and self.decode_head is not None, \
            "EncoderDecoder Segmentor must have a backbone and a decode head."
        if self.pretrained is not None:
            assert self.backbone.get("pretrained") is None, \
                "both backbone and segmentor set pretrained weight"
        # `name=` pins the param-tree paths to the reference's state_dict
        # naming (backbone./decode_head./auxiliary_head./neck.)
        self.backbone_module = build_module_from_cfg(
            self.backbone, BACKBONE, dict(name="backbone"))
        self.neck_module = (build_module_from_cfg(self.neck, NECK,
                                                  dict(name="neck"))
                            if self.neck is not None else None)
        self.decode_head_module = build_module_from_cfg(
            self.decode_head, DECODEHEAD, dict(name="decode_head"))
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

        self.align_corners = self.decode_head_module.align_corners
        self.num_classes = self.decode_head_module.num_classes
        self.out_channels = self.decode_head_module.resolved_out_channels()

    # effective init_cfg for the post-init weight system (PretrainedInit)
    def effective_init_cfg(self):
        if self.pretrained is not None and isinstance(self.pretrained, str):
            return dict(type="Pretrained", checkpoint=self.pretrained)
        return self.init_cfg

    @property
    def with_auxiliary_head(self) -> bool:
        return self.aux_head_modules is not None

    @property
    def with_neck(self) -> bool:
        return self.neck_module is not None

    def extract_feat(self, img, train: bool = False):
        x = self.backbone_module(img, train=train)
        if self.neck_module is not None:
            x = self.neck_module(x, train=train)
        return x

    def encode_decode(self, img, train: bool = False):
        """Backbone + decode head + resize to input size
        (reference encoder_decoder.py:89-98)."""
        x = self.extract_feat(img, train=train)
        out = self.decode_head_module.forward_test(x, train=train)
        return resize(out, size=img.shape[1:3], mode="bilinear",
                      align_corners=self.align_corners)

    def decode_from_features(self, feats, train: bool = False):
        """Decode-head logits from precomputed backbone features (used by the
        grad-CAM tool to differentiate w.r.t. an intermediate feature)."""
        return self.decode_head_module.forward_test(feats, train=train)

    def panoptic(self, img, object_mask_threshold: float = 0.8,
                 overlap_threshold: float = 0.8):
        """Panoptic post-processing for mask-classification heads
        (MaskFormer/Mask2Former): per-pixel winning query at the INPUT
        resolution (nearest-upsampled id map), per-query labels, kept
        mask — the triple ``val.py --panoptic`` encodes into panoptic id
        maps (``core/evaluation/panoptic.py``).  Raises for dense heads,
        which have no instance notion."""
        head = self.decode_head_module
        if not hasattr(head, "panoptic_map"):
            raise AttributeError(
                f"{type(head).__name__} is a dense decode head — panoptic "
                "output needs a mask-classification head "
                "(MaskFormerHead/Mask2FormerHead)")
        x = self.extract_feat(img, train=False)
        query_id, labels, keep = head.panoptic_map(
            x, object_mask_threshold=object_mask_threshold,
            overlap_threshold=overlap_threshold)
        if query_id.shape[1:3] != img.shape[1:3]:
            query_id = jax.image.resize(
                query_id, (query_id.shape[0], *img.shape[1:3]),
                method="nearest")
        return query_id, labels, keep

    def panoptic_tta_probs(self, img, out_size=None, flip: bool = False):
        """One TTA view's query-level probabilities, mapped back to the
        un-augmented frame: mask probabilities bilinearly resized to
        ``out_size`` (default: this view's input size) and un-flipped;
        class probabilities pass through.  Queries are deterministic
        slots (the same learned embeddings process every view), so
        per-query averaging across views is well-defined — feed the
        averages to ``maskformer_head.panoptic_from_probs`` (the
        ``val.py --panoptic --tta`` composition).  Raises for dense
        heads, which take the semantic TTA path instead."""
        head = self.decode_head_module
        if not hasattr(head, "query_probs"):
            raise AttributeError(
                f"{type(head).__name__} is a dense decode head — TTA "
                "panoptic composes at the semantic level for it")
        x = self.extract_feat(img, train=False)
        probs, mask_probs = head.query_probs(x)
        size = tuple(out_size) if out_size is not None else img.shape[1:3]
        if mask_probs.shape[2:4] != size:
            nhwq = jnp.transpose(mask_probs, (0, 2, 3, 1))
            nhwq = resize(nhwq, size=size, mode="bilinear",
                          align_corners=False)
            mask_probs = jnp.transpose(nhwq, (0, 3, 1, 2))
        if flip:
            mask_probs = mask_probs[..., ::-1]
        return probs, mask_probs

    def instances(self, img, score_threshold: float = 0.0):
        """Instance post-processing for mask-classification heads: the
        per-query ``(labels (N,Q), scores (N,Q), masks (N,Q,H,W) bool)``
        triple at the INPUT resolution (nearest-upsampled masks).
        ``val.py --instances`` encodes it into COCO-style RLE JSON
        (``core/evaluation/instances.py``); gated queries carry score 0.
        Raises for dense heads, which have no instance notion."""
        head = self.decode_head_module
        if not hasattr(head, "instance_results"):
            raise AttributeError(
                f"{type(head).__name__} is a dense decode head — instance "
                "output needs a mask-classification head "
                "(MaskFormerHead/Mask2FormerHead)")
        x = self.extract_feat(img, train=False)
        labels, scores, masks = head.instance_results(
            x, score_threshold=score_threshold)
        if masks.shape[2:4] != img.shape[1:3]:
            masks = jax.image.resize(
                masks.astype(jnp.int32),
                (*masks.shape[:2], *img.shape[1:3]),
                method="nearest").astype(bool)
        return labels, scores, masks

    def forward_train(self, img, gt_semantic_seg, meta_infos=None,
                      rescale: bool = False, train: bool = True):
        """(reference encoder_decoder.py:146-183)."""
        x = self.extract_feat(img, train=train)
        seg_logits, losses = {}, {}

        decode_logit, loss_decode = self.decode_head_module.forward_train(
            x, gt_semantic_seg, meta_infos, rescale=rescale, train=train)
        seg_logits["decode"] = decode_logit
        losses.update(add_prefix(loss_decode, "decode"))

        if self.with_auxiliary_head:
            if isinstance(self.aux_head_modules, (list, tuple)):
                aux_logits = {}
                for idx, aux_head in enumerate(self.aux_head_modules):
                    logit, loss_aux = aux_head.forward_train(
                        x, gt_semantic_seg, meta_infos, rescale=rescale,
                        train=train)
                    losses.update(add_prefix(loss_aux, f"aux_{idx}"))
                    aux_logits[idx] = logit
                seg_logits["aux"] = aux_logits
            else:
                logit, loss_aux = self.aux_head_modules.forward_train(
                    x, gt_semantic_seg, meta_infos, rescale=rescale,
                    train=train)
                losses.update(add_prefix(loss_aux, "aux"))
                seg_logits["aux"] = logit
        return seg_logits, losses

    def slide_inference(self, img, ori_img_size=None, rescale: bool = True,
                        train: bool = False):
        """Batched overlap-stitch sliding window (see module docstring).

        Numerically identical to the reference's loop
        (encoder_decoder.py:186-231): same edge-clamped grid, same
        sum-then-normalize overlap averaging.
        """
        test_cfg = self.test_cfg or {}
        h_stride, w_stride = test_cfg["stride"]
        h_crop, w_crop = test_cfg["crop_size"]
        batch_size, h_img, w_img, _ = img.shape
        out_channels = self.out_channels
        origins, h_crop, w_crop = slide_window_origins(
            h_img, w_img, h_crop, w_crop, h_stride, w_stride)

        # all windows as one MXU-sized batch, one encode_decode call
        crop_batch = gather_windows(img, origins, h_crop, w_crop)
        crop_logits = self.encode_decode(crop_batch, train=train)
        preds = stitch_windows(crop_logits, origins, h_crop, w_crop,
                               batch_size, h_img, w_img)
        if rescale and ori_img_size is not None:
            preds = resize(preds, size=tuple(ori_img_size), mode="bilinear",
                           align_corners=self.align_corners, warning=False)
        return preds

    def whole_inference(self, img, ori_img_size=None, rescale: bool = True,
                        train: bool = False):
        """(reference encoder_decoder.py:233-253)."""
        seg_logit = self.encode_decode(img, train=train)
        if rescale and ori_img_size is not None:
            seg_logit = resize(seg_logit, size=tuple(ori_img_size),
                               mode="bilinear",
                               align_corners=self.align_corners,
                               warning=False)
        return seg_logit

    def inference(self, img, ori_img_size=None, rescale: bool = True,
                  mode: Optional[str] = None, train: bool = False):
        """Mode switch + sigmoid/softmax (reference encoder_decoder.py:255-285)."""
        if mode is None:
            mode = (self.test_cfg or {}).get("mode", "whole")
        if mode == "slide":
            seg_logit = self.slide_inference(img, ori_img_size, rescale,
                                             train=train)
        else:
            seg_logit = self.whole_inference(img, ori_img_size, rescale,
                                             train=train)
        if self.out_channels == 1:
            return jax.nn.sigmoid(seg_logit)
        return jax.nn.softmax(seg_logit, axis=-1)

    def simple_test(self, img, ori_img_size=None, rescale: bool = True,
                    train: bool = False):
        """Single-image test returning seg probabilities
        (reference encoder_decoder.py:287-303 returns seg_logit; the argmax/
        threshold mirror lives in ``predict`` below)."""
        return self.inference(img, ori_img_size=ori_img_size, rescale=rescale,
                              train=train)

    def predict(self, img, ori_img_size=None, rescale: bool = True):
        """Probabilities → hard prediction (argmax / threshold)."""
        seg_logit = self.inference(img, ori_img_size=ori_img_size,
                                   rescale=rescale)
        if self.out_channels == 1:
            thr = self.decode_head_module.resolved_threshold()
            return (seg_logit[..., 0] > thr).astype(jnp.int32)
        return jnp.argmax(seg_logit, axis=-1).astype(jnp.int32)

    def batch_test(self, imgs, ori_img_size=None, rescale: bool = True,
                   train: bool = False):
        """Per-augmentation simple_test over a TTA list.

        Fixes the reference's off-by-one (encoder_decoder.py:324 starts at 1,
        dropping image 0 — SURVEY.md §8.7).
        """
        seg_logits = []
        for i in range(len(imgs)):
            size = (ori_img_size[i] if isinstance(ori_img_size, list)
                    else ori_img_size)
            img = imgs[i]
            if img.ndim == 3:
                img = img[None]
            seg_logits.append(self.simple_test(img, ori_img_size=size,
                                               rescale=rescale, train=train))
        return seg_logits

    def aug_test_logits(self, imgs, ori_img_sizes=None, rescale: bool = True):
        """Average probabilities over augmentations
        (reference encoder_decoder.py:337-353)."""
        assert rescale
        seg_logit = self.inference(
            imgs[0] if imgs[0].ndim == 4 else imgs[0][None],
            ori_img_size=ori_img_sizes[0] if ori_img_sizes else None,
            rescale=rescale)
        for i in range(1, len(imgs)):
            cur = self.inference(
                imgs[i] if imgs[i].ndim == 4 else imgs[i][None],
                ori_img_size=ori_img_sizes[i] if ori_img_sizes else None,
                rescale=rescale)
            seg_logit = seg_logit + cur
        return seg_logit / len(imgs)
