from .conv2d_adaptive_padding import Conv2dAdaptivePadding
from .conv_module import ConvModule

__all__ = ["Conv2dAdaptivePadding", "ConvModule"]
