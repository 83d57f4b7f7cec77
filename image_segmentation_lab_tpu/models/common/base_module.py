"""BaseModule / container compat layer.

Parity note for reference ``models/common/base_module.py`` (107 LoC): torch
needs a BaseModule class to carry ``init_cfg`` and run the recursive
``init_weights()`` cascade with the ``PretrainedInit`` latch (:47-68) —
mutable-module machinery with no functional analog.  In this framework that
responsibility is split:

* default initializations are **baked in at construction** (each wrapper
  takes ``weight_init``/``bias_init``; ConvModule/heads/backbones encode the
  reference's defaults);
* config-driven ``init_cfg`` (incl. ``Pretrained``) is applied to the params
  pytree by ``core.initialize.initialize`` after ``model.init`` — the
  explicit, one-shot form of the reference's cascade;
* containers are plain python lists in ``setup`` (linen registers them), so
  ``Sequential``/``ModuleList``/``ModuleDict`` subclasses are unnecessary.

The aliases below exist so reference-derived code importing them keeps
working.
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn


class BaseModule(nn.Module):
    """Alias of ``flax.linen.Module``; declare ``init_cfg`` on subclasses."""

    def init_weights(self, params, rng, init_cfg: Optional[Any] = None):
        """Apply ``init_cfg`` (or the instance's) to a params tree."""
        from ...core.initialize import initialize
        cfg = init_cfg if init_cfg is not None else getattr(
            self, "init_cfg", None)
        return initialize(params, cfg, rng)


Sequential = nn.Sequential

__all__ = ["BaseModule", "Sequential"]
