"""Padding primitives (registered in PADDING).

Parity target: reference ``models/basic/padding.py:17-29``: ``zero`` →
ZeroPad2d, ``reflect`` → ReflectionPad2d, ``replicate`` → ReplicationPad2d.
These pad the two spatial dims of NHWC tensors.  torch's 4-tuple padding
order (left, right, top, bottom) is kept for config parity.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import PADDING


def _to_lrtb(padding: Union[int, Sequence[int]]):
    if isinstance(padding, int):
        return (padding,) * 4
    padding = tuple(padding)
    if len(padding) == 2:  # (lr, tb)
        return (padding[0], padding[0], padding[1], padding[1])
    assert len(padding) == 4, f"bad padding {padding}"
    return padding


class _Pad2d(nn.Module):
    padding: Union[int, Sequence[int]] = 0
    mode: str = "constant"

    def __call__(self, x, train: bool = False):
        left, right, top, bottom = _to_lrtb(self.padding)
        pad_width = [(0, 0), (top, bottom), (left, right), (0, 0)]
        return jnp.pad(x, pad_width, mode=self.mode)


@PADDING.register("zero")
class ZeroPad2d(_Pad2d):
    mode: str = "constant"


@PADDING.register("reflect")
class ReflectionPad2d(_Pad2d):
    mode: str = "reflect"


@PADDING.register("replicate")
class ReplicationPad2d(_Pad2d):
    mode: str = "edge"
