"""ConvModule — the conv+norm+act fusion unit of the whole model zoo.

Parity target: reference ``models/common/conv_module.py:18-182``.  Behavior
kept exactly:

* ``bias='auto'`` → bias iff no norm follows (conv_module.py:109-111);
* explicit padding layer for non-official padding modes (:113-117);
* norm channel selection by conv/norm order (:133-139);
* configurable ``order`` tuple over ('conv','norm','act') (:171-182);
* self-initialization: kaiming (fan_out, normal; leaky_relu slope-aware) for
  the conv, constant 1/0 for the norm (:159-169).

TPU-native notes: there is nothing to hand-fuse — with channels-last layout
XLA fuses the norm scale/shift and the elementwise activation into the conv's
epilogue on the MXU; this module's job is purely structural.  ``inplace`` is
accepted and ignored (functional semantics).  ``with_spectral_norm`` is not
supported (unused by every reference config) and raises.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import kaiming_
from ..builder import (build_activation_layer, build_conv_layer,
                       build_norm_layer, build_padding_layer)

_DEFAULT_ACT = object()  # sentinel: distinguish "unspecified" from None=no act


class ConvModule(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int], str] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    bias: Union[bool, str] = "auto"
    conv_cfg: Optional[Dict] = None
    norm_cfg: Optional[Dict] = None
    act_cfg: Any = _DEFAULT_ACT
    inplace: bool = True
    with_spectral_norm: bool = False
    padding_mode: str = "zeros"
    order: Tuple[str, ...] = ("conv", "norm", "act")
    trainable: bool = True

    def setup(self):
        if self.with_spectral_norm:
            raise NotImplementedError(
                "spectral norm is not supported in the TPU build "
                "(unused by all reference configs)")
        act_cfg = {"type": "ReLU"} if self.act_cfg is _DEFAULT_ACT else self.act_cfg
        assert isinstance(self.order, tuple) and len(self.order) == 3
        assert set(self.order) == {"conv", "norm", "act"}

        self.with_norm = self.norm_cfg is not None
        self.with_activation = act_cfg is not None
        # bias='auto': disable bias when a norm layer follows
        bias = self.bias
        if bias == "auto":
            bias = not self.with_norm

        if self.padding_mode == "circular":
            raise NotImplementedError(
                "padding_mode='circular' is not implemented (the conv "
                "wrapper always zero-pads; no reference config uses it)")
        official_padding_mode = self.padding_mode == "zeros"
        self.with_explicit_padding = not official_padding_mode
        if self.with_explicit_padding:
            pad_cfg = dict(type=self.padding_mode)
            self.padding_layer = build_padding_layer(pad_cfg, self.padding)
        conv_padding = 0 if self.with_explicit_padding else self.padding

        # reference self-init (conv_module.py:159-169): kaiming fan_out normal,
        # leaky_relu slope-aware; bias → 0
        if self.with_activation and act_cfg.get("type") == "LeakyReLU":
            nonlinearity = "leaky_relu"
            a = act_cfg.get("negative_slope", 0.01)
        else:
            nonlinearity = "relu"
            a = 0
        w_init = kaiming_(a=a, mode="fan_out", nonlinearity=nonlinearity)
        b_init = (lambda key, shape, dtype: jnp.zeros(shape, dtype))

        self.conv = build_conv_layer(
            self.conv_cfg, self.in_channels, self.out_channels,
            self.kernel_size, stride=self.stride, padding=conv_padding,
            dilation=self.dilation, groups=self.groups, bias=bias,
            trainable=self.trainable, weight_init=w_init, bias_init=b_init)

        if self.with_norm:
            # norm after conv → out_channels; norm before conv → in_channels
            if self.order.index("norm") > self.order.index("conv"):
                norm_channels = self.out_channels
            else:
                norm_channels = self.in_channels
            norm_cfg = dict(self.norm_cfg)
            if not self.trainable:
                norm_cfg["requires_grad"] = False
            self.norm_name, norm = build_norm_layer(norm_cfg, norm_channels)
            setattr(self, self.norm_name, norm)
        else:
            self.norm_name = None

        if self.with_activation:
            self.activate = build_activation_layer(dict(act_cfg))

    @property
    def norm(self):
        if self.norm_name:
            return getattr(self, self.norm_name)
        return None

    def __call__(self, x, activate: bool = True, norm: bool = True,
                 train: bool = False):
        for layer in self.order:
            if layer == "conv":
                if self.with_explicit_padding:
                    x = self.padding_layer(x)
                x = self.conv(x, train=train)
            elif layer == "norm" and norm and self.with_norm:
                x = self.norm(x, train=train)
            elif layer == "act" and activate and self.with_activation:
                x = self.activate(x, train=train)
        return x
