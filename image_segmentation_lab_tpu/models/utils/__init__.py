from .depthwise_separable_conv_module import DepthwiseSeparableConvModule
from .inverted_residual import InvertedResidual, InvertedResidualV3
from .res_layer import ResLayer
from .se_layer import SELayer
