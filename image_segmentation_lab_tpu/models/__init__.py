from . import basic, common  # noqa: F401  (imports trigger registration)
from .builder import *  # noqa: F401,F403
