"""BaseSegmentor.

Parity target: reference ``models/segmentors/base.py`` (190 LoC): abstract
extract_feat/encode_decode/forward_train/simple_test/batch_test (:48-72), the
``forward(img, gt, img_metas, rescale, return_loss)`` train/test dispatch
(:101-114), ``forward_test`` single-vs-multi image routing on
``ori_img_size_hw`` (:74-99), and ``show_result`` palette overlay (:116-190,
implemented with numpy/cv2 — host-side visualization, not a compiled path).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
from flax import linen as nn


class BaseSegmentor(nn.Module):
    """Base class for segmentors (linen Module)."""

    @property
    def with_neck(self) -> bool:
        return getattr(self, "neck", None) is not None

    @property
    def with_auxiliary_head(self) -> bool:
        return getattr(self, "auxiliary_head", None) is not None

    @property
    def with_decode_head(self) -> bool:
        return getattr(self, "decode_head", None) is not None

    # abstract API (reference base.py:48-72)
    def extract_feat(self, img, train=False):
        raise NotImplementedError

    def encode_decode(self, img, train=False):
        raise NotImplementedError

    def forward_train(self, img, gt_semantic_seg, meta_infos=None,
                      rescale=False, train=True):
        raise NotImplementedError

    def simple_test(self, img, ori_img_size=None, rescale=True, train=False):
        raise NotImplementedError

    def batch_test(self, imgs, ori_img_size=None, rescale=True, train=False):
        raise NotImplementedError

    def forward_test(self, imgs, meta_infos=None, rescale: bool = True,
                     train: bool = False, **kwargs):
        """Single vs multi-image (TTA) routing (reference base.py:74-99).

        ``imgs``: list of (H,W,C)/(N,H,W,C) arrays — the outer list is
        test-time augmentations.
        """
        if meta_infos:
            ori_img_sizes = meta_infos.get("ori_img_size_hw", None)
            if ori_img_sizes is not None and len(imgs) != len(ori_img_sizes) \
                    and isinstance(ori_img_sizes, list):
                raise ValueError(
                    f"num of images ({len(imgs)}) != "
                    f"num of ori_img_sizes ({len(ori_img_sizes)})")
        else:
            ori_img_sizes = None

        if len(imgs) == 1:
            img = imgs[0]
            if img.ndim == 3:
                img = img[None]
            size = (ori_img_sizes[0] if isinstance(ori_img_sizes, list)
                    else ori_img_sizes)
            return self.simple_test(img, ori_img_size=size, rescale=rescale,
                                    train=train, **kwargs)
        return self.batch_test(imgs, ori_img_size=ori_img_sizes,
                               rescale=rescale, train=train, **kwargs)

    def __call__(self, img, gt=None, img_metas=None, rescale: bool = True,
                 return_loss: bool = False, train: bool = False, **kwargs):
        """Train/test dispatch (reference base.py:101-114)."""
        if return_loss:
            return self.forward_train(img, gt, meta_infos=img_metas,
                                      rescale=rescale, train=train, **kwargs)
        return self.forward_test(img, meta_infos=img_metas, rescale=rescale,
                                 train=train, **kwargs)


def show_result(img: np.ndarray,
                seg: np.ndarray,
                palette=None,
                num_classes: Optional[int] = None,
                opacity: float = 0.5,
                out_file: Optional[str] = None) -> np.ndarray:
    """Overlay a segmentation map on an image (reference base.py:116-190).

    Host-side numpy utility; ``seg`` is an (H, W) int class map.
    """
    assert 0 < opacity <= 1.0
    seg = np.asarray(seg)
    if num_classes is None:
        num_classes = int(seg.max()) + 1
    if palette is None:
        rng = np.random.RandomState(42)
        palette = rng.randint(0, 255, size=(num_classes, 3))
    palette = np.asarray(palette)
    color_seg = palette[seg.astype(np.int64) % len(palette)].astype(np.uint8)
    out = (img * (1 - opacity) + color_seg * opacity).astype(np.uint8)
    if out_file is not None:
        from ...core.fileio import imwrite
        imwrite(out[..., ::-1], out_file)  # RGB→BGR for cv2 writer
    return out
