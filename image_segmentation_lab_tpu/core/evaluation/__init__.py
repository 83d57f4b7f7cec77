from .class_names import dataset_aliases, get_classes, get_palette
from .instance_ap import IOU_THRESHOLDS, InstanceAPEvaluator, mask_iou
from .instances import instances_to_json, mask_to_rle, rle_to_mask
from .metrics import SegEvaluator
from .panoptic import (INSTANCE_OFFSET, PanopticEvaluator, panoptic_quality,
                       queries_to_panoptic, semantic_to_panoptic)
from .table import AsciiTable
