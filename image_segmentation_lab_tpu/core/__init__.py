from . import (dataset, evaluation, fileio, initialize,  # noqa: F401
               mixed_precision, optimizers)
from .builder import (DATASET, INITIALIZERS, LR_SCHEDULER, OPTIMIZER, SAMPLER,
                      build_from_cfg, build_optimizer)
from .registry_hub import *  # noqa: F401,F403
