"""Feature2Pyramid neck (mmseg ``Feature2Pyramid``): turn an isotropic
transformer's same-resolution taps into a 4-scale pyramid.

Beyond-reference addition riding the NECK hook (reference
encoder_decoder.py:52-63 declares the hook; its registry ships empty).
BEiT/ViT emit every tap at stride `patch_size` (16); UPerHead wants
strides (4, 8, 16, 32).  Each tap gets a rescale branch keyed by its
factor: 4 → deconv2x2/s2 + norm + GELU + deconv2x2/s2; 2 → one deconv;
1 → identity; 0.5 → maxpool2/s2; 0.25 → maxpool4/s4 (upstream table).
The deconvs lower to input-dilated MXU convs (`basic/convolution.py
ConvTranspose2d`).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from flax import linen as nn

from ...core.registry_hub import NECK
from ...ops.pooling import max_pool2d
from ..basic.convolution import ConvTranspose2d
from ..builder import build_norm_layer


@NECK.register()
class Feature2Pyramid(nn.Module):
    embed_dim: int = 768
    rescales: Sequence[float] = (4, 2, 1, 0.5)
    norm_cfg: Optional[Dict] = None

    def setup(self):
        ncfg = dict(self.norm_cfg or dict(type="SyncBatchNorm",
                                          requires_grad=True))
        ops = {}
        for k in self.rescales:
            if k == 4:
                ops[k] = dict(
                    up1=ConvTranspose2d(self.embed_dim, self.embed_dim, 2,
                                        stride=2, name="up4_deconv1"),
                    norm=build_norm_layer(ncfg, self.embed_dim,
                                          postfix="_up4")[1],
                    up2=ConvTranspose2d(self.embed_dim, self.embed_dim, 2,
                                        stride=2, name="up4_deconv2"))
            elif k == 2:
                ops[k] = dict(up1=ConvTranspose2d(
                    self.embed_dim, self.embed_dim, 2, stride=2,
                    name="up2_deconv"))
            elif k in (1, 0.5, 0.25):
                ops[k] = dict()
            else:
                raise KeyError(f"invalid rescale {k!r} (expect 4/2/1/.5/.25)")
        self.ops = ops

    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.rescales), (
            len(inputs), self.rescales)
        outs = []
        for x, k in zip(inputs, self.rescales):
            branch = self.ops[k]
            if k == 4:
                x = branch["up1"](x, train=train)
                x = nn.gelu(branch["norm"](x, train=train),
                            approximate=False)
                x = branch["up2"](x, train=train)
            elif k == 2:
                x = branch["up1"](x, train=train)
            elif k == 0.5:
                x = max_pool2d(x, 2, 2)
            elif k == 0.25:
                x = max_pool2d(x, 4, 4)
            outs.append(x)
        return tuple(outs)
