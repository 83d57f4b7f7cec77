from .featurepyramid import Feature2Pyramid
from .fpn import FPN
from .mla_neck import MLAModule, MLANeck
