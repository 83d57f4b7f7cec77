"""CityscapesDataset.

The reference ships an orphaned ``configs/dataset/cityscapes.py`` in the old
mmseg pipeline format with no dataset class behind it (SURVEY.md §8.9).
This implements the class so cityscapes configs run: standard 19
trainId classes/palette (core/evaluation tables), ``*_leftImg8bit.png`` /
``*_gtFine_labelTrainIds.png`` suffix convention, generic CustomDataset
loading + an albumentations-YAML pipeline.
"""

from __future__ import annotations

from ..evaluation.class_names import get_classes, get_palette
from ..registry_hub import DATASET
from .custom import CustomDataset


@DATASET.register()
class CityscapesDataset(CustomDataset):
    CLASSES = tuple(get_classes("cityscapes"))
    PALETTE = get_palette("cityscapes")

    def __init__(self,
                 img_suffix="_leftImg8bit.png",
                 seg_map_suffix="_gtFine_labelTrainIds.png",
                 **kwargs):
        super().__init__(img_suffix=img_suffix,
                         seg_map_suffix=seg_map_suffix, **kwargs)
