"""Standard-benchmark dataset classes (ADE20K, Pascal VOC).

The reference only ships Kvasir (+ an orphaned cityscapes config) but its
evaluation tables cover ten datasets (core/evaluation/class_names.py);
these registry entries make the common benchmarks usable directly with the
generic CustomDataset loading + an albumentations-YAML pipeline.
"""

from __future__ import annotations

from ..evaluation.class_names import get_classes, get_palette
from ..registry_hub import DATASET
from .custom import CustomDataset


@DATASET.register()
class ADE20KDataset(CustomDataset):
    """ADE20K: 150 classes, ids shifted down by one (0 = ignore)."""

    CLASSES = tuple(get_classes("ade"))
    PALETTE = get_palette("ade")

    def __init__(self, img_suffix=".jpg", seg_map_suffix=".png",
                 reduce_zero_label=True, **kwargs):
        super().__init__(img_suffix=img_suffix,
                         seg_map_suffix=seg_map_suffix,
                         reduce_zero_label=reduce_zero_label, **kwargs)


@DATASET.register()
class PascalVOCDataset(CustomDataset):
    """Pascal VOC 2012: 21 classes, split files under ImageSets/Segmentation."""

    CLASSES = tuple(get_classes("voc"))
    PALETTE = get_palette("voc")

    def __init__(self, img_suffix=".jpg", seg_map_suffix=".png", split=None,
                 **kwargs):
        super().__init__(img_suffix=img_suffix,
                         seg_map_suffix=seg_map_suffix, split=split,
                         **kwargs)
