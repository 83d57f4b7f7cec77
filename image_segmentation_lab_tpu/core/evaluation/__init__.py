from .class_names import dataset_aliases, get_classes, get_palette
from .metrics import SegEvaluator
from .table import AsciiTable
