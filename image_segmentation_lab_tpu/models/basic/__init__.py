from . import activations, convolution, drop, normalization, padding  # noqa: F401
from .activations import (GELU, HSigmoid, HSwish, Identity, LeakyReLU, PReLU,
                          ReLU, ReLU6, Sigmoid, Swish, Tanh)
from .convolution import Conv1d, Conv2d, Conv3d, Linear
from .drop import (AlphaDropout, DropPath, Dropout, Dropout2d,
                   FeatureAlphaDropout, drop_path)
from .normalization import (BatchNorm2d, GroupNorm, InstanceNorm2d, LayerNorm,
                            LayerNorm2d, SyncBatchNorm)
from .padding import ReflectionPad2d, ReplicationPad2d, ZeroPad2d
