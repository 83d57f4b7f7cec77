from .base_module import BaseModule, Sequential
from .conv2d_adaptive_padding import Conv2dAdaptivePadding
from .conv_module import ConvModule

__all__ = ["BaseModule", "Sequential", "Conv2dAdaptivePadding", "ConvModule"]
