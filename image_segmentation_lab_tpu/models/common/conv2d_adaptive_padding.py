"""TF-"SAME" adaptive-padding convolution.

Parity target: reference ``models/common/conv2d_adaptive_padding.py:6-53``,
which computes SAME padding from the input size at forward time and pads with
the extra pixel at the bottom/right.  That is exactly XLA's ``'SAME'``
padding convention, so the whole class collapses to a Conv2d whose padding is
pinned to ``'SAME'`` — resolved statically at trace time, no runtime cost.
"""

from __future__ import annotations

from ...core.registry_hub import CONVOLUTION
from ..basic.convolution import Conv2d


@CONVOLUTION.register("Conv2dAdaptivePadding")
class Conv2dAdaptivePadding(Conv2d):
    """Conv2d with input-size-adaptive TF-SAME padding."""

    def _resolve_padding(self, n: int):
        return "SAME"
