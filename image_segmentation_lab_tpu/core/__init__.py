from . import (dataset, evaluation, fileio, inference,  # noqa: F401
               initialize, mixed_precision, optimizers, sampler)
from .builder import (DATASET, INITIALIZERS, LR_SCHEDULER, OPTIMIZER, SAMPLER,
                      build_from_cfg, build_optimizer)
from .registry_hub import *  # noqa: F401,F403
