"""Convolution primitives (registered in CONVOLUTION).

Parity target: reference ``models/basic/convolution.py:21-38`` registers
torch ``Conv1d/Conv2d/Conv3d`` plus the alias ``Conv`` → Conv2d.  Here the
registered classes are channels-last (NHWC / NWC / NDHWC) wrappers over
``jax.lax.conv_general_dilated`` with torch-compatible constructor arguments
(``in_channels, out_channels, kernel_size, stride, padding, dilation, groups,
bias``) so reference configs instantiate unchanged.

Channels-last is the TPU-native layout: the channel dimension maps onto the
128-lane axis of the VPU/MXU, letting XLA tile convs onto the MXU without
transposes.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.registry_hub import CONVOLUTION
from ...ops.dilated_conv import dilated_conv3x3_same, worth_it
from .param_utils import compute_cast, create_param, kaiming_uniform_torch

IntOrTuple = Union[int, Sequence[int]]


def _ntuple(x: IntOrTuple, n: int) -> Tuple[int, ...]:
    if isinstance(x, (tuple, list)):
        assert len(x) == n, f"expected {n} values, got {x}"
        return tuple(int(v) for v in x)
    return (int(x),) * n


class _ConvND(nn.Module):
    """N-dimensional channels-last convolution with torch-style arguments."""

    in_channels: int
    out_channels: int
    kernel_size: IntOrTuple
    stride: IntOrTuple = 1
    padding: Union[IntOrTuple, str] = 0
    dilation: IntOrTuple = 1
    groups: int = 1
    bias: bool = True
    padding_mode: str = "zeros"
    trainable: bool = True
    # optional overrides of the torch-default kaiming-uniform initialization
    weight_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    num_spatial_dims: int = 2

    def _resolve_padding(self, n: int):
        if isinstance(self.padding, str):
            return self.padding.upper()  # 'SAME' / 'VALID'
        pad = _ntuple(self.padding, n)
        return [(p, p) for p in pad]

    def _use_slab_path(self, x, ksize, stride, dilation, padding) -> bool:
        """Large-dilation 3x3 stride-1 SAME convs (ASPP at d8) are cheaper as
        a center matmul + boundary slabs — see ``ops/dilated_conv``."""
        if not (self.num_spatial_dims == 2 and self.groups == 1
                and ksize == (3, 3) and stride == (1, 1)
                and dilation[0] == dilation[1] and dilation[0] > 1
                and self.padding_mode == "zeros"):
            return False
        d = dilation[0]
        same = padding == "SAME" or padding == [(d, d), (d, d)]
        if not same:
            return False
        h, w = int(x.shape[1]), int(x.shape[2])
        return worth_it(h, w, d)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n = self.num_spatial_dims
        ksize = _ntuple(self.kernel_size, n)
        stride = _ntuple(self.stride, n)
        dilation = _ntuple(self.dilation, n)
        assert self.in_channels % self.groups == 0
        assert self.out_channels % self.groups == 0
        assert x.shape[-1] == self.in_channels, (
            f"expected {self.in_channels} input channels, got {x.shape[-1]}")

        # kernel layout: spatial... + (in/groups, out)  (HWIO for 2D)
        kshape = ksize + (self.in_channels // self.groups, self.out_channels)
        fan_in = int(np.prod(ksize)) * self.in_channels // self.groups
        w_init = self.weight_init or kaiming_uniform_torch(fan_in)
        weight = create_param(self, "weight", w_init, kshape, self.trainable)
        bias = None
        if self.bias:
            b_init = self.bias_init or kaiming_uniform_torch(fan_in)
            bias = create_param(self, "bias", b_init,
                                (self.out_channels,), self.trainable)

        padding = self._resolve_padding(n)
        if self.padding_mode != "zeros":
            # torch pre-pads with the mode, then convolves unpadded
            # (nn.Conv2d semantics); a silent zero-pad here would produce
            # different borders than the config asked for
            mode = {"reflect": "reflect", "replicate": "edge",
                    "circular": "wrap"}.get(self.padding_mode)
            assert mode is not None, (
                f"unsupported padding_mode '{self.padding_mode}'")
            assert not isinstance(padding, str), (
                "padding_mode with 'SAME'/'VALID' string padding is not "
                "supported — give explicit int padding")
            if any(p != (0, 0) for p in padding):
                x = jnp.pad(x, [(0, 0)] + list(padding) + [(0, 0)],
                            mode=mode)
                padding = [(0, 0)] * n

        x, weight = compute_cast(x, weight)
        if self._use_slab_path(x, ksize, stride, dilation, padding):
            # large-dilation 3x3 SAME conv: skip the taps that only multiply
            # zero padding (2.4x on the flagship ASPP head — ops/dilated_conv)
            out = dilated_conv3x3_same(x, weight, dilation[0])
        else:
            spatial = "".join("DHW"[3 - n + i] for i in range(n))
            dn = jax.lax.conv_dimension_numbers(
                x.shape, weight.shape,
                (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
            out = jax.lax.conv_general_dilated(
                x, weight,
                window_strides=stride,
                padding=padding,
                rhs_dilation=dilation,
                dimension_numbers=dn,
                feature_group_count=self.groups)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


@CONVOLUTION.register("Conv1d")
class Conv1d(_ConvND):
    num_spatial_dims: int = 1


@CONVOLUTION.register("Conv2d", aliases=("Conv",))
class Conv2d(_ConvND):
    num_spatial_dims: int = 2


@CONVOLUTION.register("Conv3d")
class Conv3d(_ConvND):
    num_spatial_dims: int = 3


@CONVOLUTION.register("ConvTranspose2d", aliases=("deconv",))
class ConvTranspose2d(nn.Module):
    """torch ``nn.ConvTranspose2d`` semantics in NHWC (ERFNet's
    upsampler and any ``conv_cfg=dict(type='deconv')``).

    Lowered as an input-dilated forward conv: lhs_dilation=stride,
    spatially-flipped kernel, per-side padding ``k-1-p`` (plus
    ``output_padding`` on the high side) — bit-equivalent to torch's
    gradient-of-conv definition, and exactly the form XLA pattern-
    matches onto the MXU.  Weight layout (kh, kw, out, in) mirrors
    torch's (in, out, kh, kw) for the checkpoint converter.
    """

    in_channels: int
    out_channels: int
    kernel_size: IntOrTuple
    stride: IntOrTuple = 1
    padding: IntOrTuple = 0
    output_padding: IntOrTuple = 0
    groups: int = 1
    bias: bool = True
    dilation: IntOrTuple = 1
    trainable: bool = True
    weight_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.groups == 1, "grouped deconv not needed by any config"
        assert _ntuple(self.dilation, 2) == (1, 1), \
            "dilated deconv not needed by any config"
        k = _ntuple(self.kernel_size, 2)
        s = _ntuple(self.stride, 2)
        p = _ntuple(self.padding, 2)
        op = _ntuple(self.output_padding, 2)
        assert all(o < st for o, st in zip(op, s)), \
            "output_padding must be smaller than stride (torch contract)"

        kshape = k + (self.out_channels, self.in_channels)
        # torch kaiming-uniform on (in, out, kh, kw): fan_in = out*k*k
        fan_in = int(np.prod(k)) * self.out_channels
        w_init = self.weight_init or kaiming_uniform_torch(fan_in)
        weight = create_param(self, "weight", w_init, kshape, self.trainable)
        bias = None
        if self.bias:
            b_init = self.bias_init or kaiming_uniform_torch(fan_in)
            bias = create_param(self, "bias", b_init,
                                (self.out_channels,), self.trainable)

        x, weight = compute_cast(x, weight)
        weight = weight[::-1, ::-1]          # rot180: transpose-conv kernel
        pads = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in (0, 1)]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, weight.shape, ("NHWC", "HWOI", "NHWC"))
        out = jax.lax.conv_general_dilated(
            x, weight, window_strides=(1, 1), padding=pads,
            lhs_dilation=s, dimension_numbers=dn)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


class Linear(nn.Module):
    """Torch-style dense layer (used by heads/tools; not in a registry).

    ``weight_init``/``bias_init`` override the torch kaiming-uniform
    default (same override contract as the conv modules)."""

    in_features: int
    out_features: int
    bias: bool = True
    trainable: bool = True
    weight_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        w_init = self.weight_init or kaiming_uniform_torch(self.in_features)
        weight = create_param(self, "weight", w_init,
                              (self.in_features, self.out_features),
                              self.trainable)
        x, weight = compute_cast(x, weight)
        out = x @ weight
        if self.bias:
            b_init = self.bias_init or kaiming_uniform_torch(
                self.in_features)
            b = create_param(self, "bias", b_init,
                             (self.out_features,), self.trainable)
            out = out + b.astype(out.dtype)
        return out
