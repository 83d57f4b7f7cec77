from .class_names import dataset_aliases, get_classes, get_palette
from .metrics import SegEvaluator
from .panoptic import (INSTANCE_OFFSET, PanopticEvaluator, panoptic_quality,
                       queries_to_panoptic, semantic_to_panoptic)
from .table import AsciiTable
