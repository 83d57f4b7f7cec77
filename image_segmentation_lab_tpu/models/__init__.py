from . import basic, common  # noqa: F401  (imports trigger registration)
from . import backbones, decode_heads, losses, necks, segmentors  # noqa: F401
from .builder import *  # noqa: F401,F403
