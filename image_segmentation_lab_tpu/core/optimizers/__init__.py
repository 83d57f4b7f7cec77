from . import lr_schedulers, optimizers  # noqa: F401  (registration)
from .lr_schedulers import (EpochSchedule, ExponentialLR, LambdaLR,
                            PolynomialLR, StepLR, WarmScheduler)
from .paramwise import ParamwiseRules, build_paramwise_optimizer
