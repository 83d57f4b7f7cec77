"""Central creation of all registries.

The reference scatters registry creation across ``models/builder.py:29-40``
(11 model registries) and ``core/builder.py:15-19`` (5 core registries).  They
are created in one place here so importing either builder module sees the same
instances, while the per-module ``build_*`` helpers live next to their layer.
"""

from ..registry import RegisterManager

# model-side registries (reference models/builder.py:29-40)
ACTIVATION = RegisterManager.create_registry("activation")
CONVOLUTION = RegisterManager.create_registry("convolution")
DROPOUT = RegisterManager.create_registry("dropout")
NORMALIZATION = RegisterManager.create_registry("normalization")
PADDING = RegisterManager.create_registry("padding")
PLUGINS = RegisterManager.create_registry("plugins")
BACKBONE = RegisterManager.create_registry("backbone")
NECK = RegisterManager.create_registry("neck")
DECODEHEAD = RegisterManager.create_registry("decodehead")
SEGMENTOR = RegisterManager.create_registry("segmentor")
LOSS = RegisterManager.create_registry("loss")

# core-side registries (reference core/builder.py:15-19)
DATASET = RegisterManager.create_registry("dataset")
INITIALIZERS = RegisterManager.create_registry("initializers")
SAMPLER = RegisterManager.create_registry("sampler")
OPTIMIZER = RegisterManager.create_registry("optimizer")
LR_SCHEDULER = RegisterManager.create_registry("lr_scheduler")

__all__ = [
    "ACTIVATION", "CONVOLUTION", "DROPOUT", "NORMALIZATION", "PADDING",
    "PLUGINS", "BACKBONE", "NECK", "DECODEHEAD", "SEGMENTOR", "LOSS",
    "DATASET", "INITIALIZERS", "SAMPLER", "OPTIMIZER", "LR_SCHEDULER",
]
