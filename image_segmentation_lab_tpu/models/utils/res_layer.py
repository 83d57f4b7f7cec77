"""ResLayer — stacks residual blocks into one stage.

Parity target: reference ``models/utils/res_layer.py:19-108``: first block
carries the stride + downsample; ``avg_down`` moves downsampling into an
AvgPool before a 1x1 conv; ``multi_grid`` overrides per-block dilations in
the last stage; ``contract_dilation`` halves the first block's dilation.
The downsample branch itself is built *inside* the first block here (same
params, cleaner functional ownership).  ``with_cp`` (torch checkpointing,
reference resnet.py:98-101) maps to ``flax.linen.remat`` over the block.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Type

from flax import linen as nn


class ResLayer(nn.Module):
    block: Type[nn.Module]
    inplanes: int
    planes: int
    num_blocks: int
    stride: int = 1
    dilation: int = 1
    avg_down: bool = False
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    multi_grid: Optional[Sequence[int]] = None
    contract_dilation: bool = False
    with_cp: bool = False
    block_kwargs: Optional[Dict[str, Any]] = None

    def setup(self):
        norm_cfg = self.norm_cfg or dict(type="BN")
        # static_argnums=(2,): `train` (self=0, x=1) is a python bool that
        # selects BN mode — it must stay static under remat
        block_cls = (nn.remat(self.block, static_argnums=(2,))
                     if self.with_cp else self.block)
        kwargs = dict(self.block_kwargs or {})

        if self.multi_grid is None:
            if self.dilation > 1 and self.contract_dilation:
                first_dilation = self.dilation // 2
            else:
                first_dilation = self.dilation
        else:
            first_dilation = self.multi_grid[0]

        blocks = []
        inplanes = self.inplanes
        for i in range(self.num_blocks):
            blocks.append(block_cls(
                inplanes=inplanes,
                planes=self.planes,
                stride=self.stride if i == 0 else 1,
                dilation=(first_dilation if i == 0 else
                          (self.dilation if self.multi_grid is None
                           else self.multi_grid[i])),
                avg_down=self.avg_down,
                conv_cfg=self.conv_cfg,
                norm_cfg=norm_cfg,
                **kwargs))
            inplanes = self.planes * self.block.expansion
        self.blocks = blocks

    def __call__(self, x, train: bool = False):
        for block in self.blocks:
            x = block(x, train)  # positional: remat static_argnums
        return x
