from .featurepyramid import Feature2Pyramid
from .fpn import FPN
from .jpu import JPU
from .mla_neck import MLAModule, MLANeck
from .multilevel_neck import MultiLevelNeck
