"""STDC detail-guidance head (Fan et al., CVPR 2021; mmseg ``STDCHead``
semantics): an FCN head supervised by a *detail* (boundary) target
derived on the fly from the segmentation mask — fixed Laplacian
convolutions at strides 1/2/4, nearest-upsampled, fused by the paper's
frozen (0.6, 0.3, 0.1) kernel, binarized at ``boundary_threshold``.

The target derivation is pure fixed-kernel convs + thresholds, so it
compiles straight into the training step (the reference ecosystem runs
it per batch on the GPU inside the loss; here XLA fuses it with
everything else).  Losses (typically CE + Dice) then score the head's
logits against the binary detail map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from .fcn_head import FCNHead

_LAPLACIAN = np.array([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]],
                      np.float32)
_FUSION = np.array([0.6, 0.3, 0.1], np.float32)


def detail_target(seg_label: jnp.ndarray,
                  boundary_threshold: float = 0.1) -> jnp.ndarray:
    """(N, H, W) int mask -> (N, H, W) {0,1} int boundary map."""
    N, H, W = seg_label.shape
    x = seg_label.astype(jnp.float32)[..., None]          # NHWC, C=1
    kern = jnp.asarray(_LAPLACIAN).reshape(3, 3, 1, 1)

    def lap(x, stride):
        y = jax.lax.conv_general_dilated(
            x, kern, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.clip(y, 0.0, None)

    maps = []
    for s in (1, 2, 4):
        m = lap(x, s)
        m = (m > boundary_threshold).astype(jnp.float32)
        if s > 1:
            m = resize(m, size=(H, W), mode="nearest")
            m = (m > boundary_threshold).astype(jnp.float32)
        maps.append(m)
    fused = sum(w * m for w, m in zip(_FUSION, maps))
    return (fused > boundary_threshold).astype(jnp.int32)[..., 0]


@DECODEHEAD.register()
class STDCHead(FCNHead):
    boundary_threshold: float = 0.1

    def losses(self, seg_logit, seg_label, meta_infos=None,
               rescale: bool = False):
        target = detail_target(seg_label, self.boundary_threshold)
        return super().losses(seg_logit, target, meta_infos,
                              rescale=rescale)
