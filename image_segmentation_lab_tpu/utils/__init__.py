from .math_utils import make_divisible
from .ops import Upsample, add_prefix, resize, resize_bilinear, resize_nearest

__all__ = ["make_divisible", "Upsample", "add_prefix", "resize",
           "resize_bilinear", "resize_nearest"]
