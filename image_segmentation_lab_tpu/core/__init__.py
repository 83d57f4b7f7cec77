from . import fileio, initialize, mixed_precision, optimizers  # noqa: F401
from .builder import (DATASET, INITIALIZERS, LR_SCHEDULER, OPTIMIZER, SAMPLER,
                      build_from_cfg, build_optimizer)
from .registry_hub import *  # noqa: F401,F403
