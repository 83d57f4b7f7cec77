from . import lr_schedulers, optimizers  # noqa: F401  (registration)
from .lr_schedulers import (EpochSchedule, ExponentialLR, LambdaLR,
                            PolynomialLR, StepLR, WarmScheduler)
