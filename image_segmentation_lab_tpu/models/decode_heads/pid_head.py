"""PIDHead (mmseg ``PIDHead`` semantics): the three-logit head for the
PIDNet backbone.

Beyond-reference addition.  Consumes the backbone's ``(x_p, x_d,
merged)`` triple: at eval only the merged 1/8 features run (BN-ReLU-3x3-
BN-ReLU then the 1x1 classifier); in training the P tap gets its own semantic
classifier and the D tap a 1-channel boundary classifier, with four
losses in the upstream arrangement:

* ``loss_sem_p``  — loss_decode[0] on the P logits (plain CE, 0.4x);
* ``loss_sem_i``  — loss_decode[1] on the merged logits (OHEM CE);
* ``loss_bd``     — loss_decode[2] on the boundary logits vs an edge
  target (class-balanced BCE, 20x);
* ``loss_sem_bd`` — loss_decode[3]: the merged logits again, restricted
  to pixels the D branch is confident are boundary
  (``sigmoid(d) > 0.8``; everything else becomes ignore_index).

TPU-native difference: upstream reads the edge target from a dataset
``GenerateEdge`` pipeline step (host numpy + cv2.dilate per sample);
here the edge map derives from the label ON DEVICE inside the loss —
4-direction neighbor disagreement (valid pairs only) dilated by an
``edge_width`` max-window with cv2's even-kernel anchor convention —
so the data pipeline needs no extra fields and the whole thing lives in
the jitted train step (golden-tested against an independent numpy
derivation in ``tests/test_pidnet.py``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...core.initialize.init_functions import constant_, normal_
from ..builder import build_norm_layer
from ...utils.ops import resize
from ..basic.convolution import Conv2d
from ..common.conv_module import ConvModule
from ..losses import accuracy
from .decode_head import BaseDecodeHead


def boundary_from_label(label: jnp.ndarray, edge_width: int = 4,
                        ignore_index: int = 255) -> jnp.ndarray:
    """(N, H, W) int labels -> (N, H, W) float {0,1} edge map.

    A pixel seeds an edge when it disagrees with its upper / left /
    upper-left / upper-right neighbor and both pixels are valid; seeds
    are dilated by an ``edge_width`` square max-window anchored the way
    cv2.dilate anchors even kernels (window offsets ``-w//2 ..
    w - 1 - w//2``).
    """
    valid = label != ignore_index

    def shift_cmp(di: int, dj: int) -> jnp.ndarray:
        # seed at (i, j) iff label[i, j] != label[i+di, j+dj], both valid
        nb = jnp.roll(label, shift=(-di, -dj), axis=(1, 2))
        nb_valid = jnp.roll(valid, shift=(-di, -dj), axis=(1, 2))
        seed = (label != nb) & valid & nb_valid
        H, W = label.shape[1:3]
        ii = jnp.arange(H)[:, None]
        jj = jnp.arange(W)[None, :]
        inside = ((ii + di >= 0) & (ii + di < H)
                  & (jj + dj >= 0) & (jj + dj < W))
        return seed & inside

    seeds = (shift_cmp(-1, 0) | shift_cmp(0, -1)
             | shift_cmp(-1, -1) | shift_cmp(-1, 1))
    if edge_width <= 1:
        return seeds.astype(jnp.float32)
    w = int(edge_width)
    lo = w // 2
    hi = w - 1 - lo
    return jax.lax.reduce_window(
        seeds.astype(jnp.float32), -jnp.inf, jax.lax.max,
        window_dimensions=(1, w, w), window_strides=(1, 1, 1),
        padding=((0, 0), (lo, hi), (lo, hi)))


class _BasePIDHead(nn.Module):
    """BN -> ReLU -> 3x3 conv -> BN -> ReLU -> 1x1 classifier (the official
    PIDNet/DDRNet ``segmenthead`` block; mmseg ``BasePIDHead``)."""

    in_channels: int
    channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    def setup(self):
        ncfg = dict(self.norm_cfg or dict(type="BN"))
        self.conv = ConvModule(self.in_channels, self.channels, 3,
                               padding=1, norm_cfg=ncfg,
                               act_cfg=dict(type="ReLU"),
                               order=("norm", "act", "conv"))
        # official segmenthead: bn1-relu-conv3x3-bn2-relu-conv1x1 — the
        # second norm+act sits between the 3x3 and the classifier
        self.norm = build_norm_layer(ncfg, self.channels)[1]
        self.cls = Conv2d(self.channels, self.out_channels, 1,
                          weight_init=normal_(0, 0.01),
                          bias_init=constant_(0.0))

    def __call__(self, x, train: bool = False):
        x = self.conv(x, train=train)
        x = nn.relu(self.norm(x, train=train))
        return self.cls(x, train=train)


@DECODEHEAD.register()
class PIDHead(BaseDecodeHead):
    """in_channels = merged width (4C); channels = conv width.  The P/D
    taps are in_channels//2 wide (2C) per the backbone contract."""

    edge_width: int = 4
    bd_confidence: float = 0.8

    def setup(self):
        super().setup()
        assert len(self.losses_decode) == 4, (
            "PIDHead needs loss_decode=[sem_p, sem_i, boundary, sem_bd], "
            f"got {len(self.losses_decode)}")
        ncfg = dict(self.norm_cfg or dict(type="BN"))
        out_ch = self.resolved_out_channels()
        self.i_head = _BasePIDHead(self.in_channels, self.channels, out_ch,
                                   norm_cfg=ncfg)
        self.p_head = _BasePIDHead(self.in_channels // 2, self.channels // 2,
                                   out_ch, norm_cfg=ncfg)
        self.d_head = _BasePIDHead(self.in_channels // 2,
                                   self.in_channels // 4, 1, norm_cfg=ncfg)

    def __call__(self, inputs, train: bool = False):
        # eval path: merged features only (upstream PIDHead.forward eval arm)
        x = inputs[-1] if isinstance(inputs, (list, tuple)) else inputs
        return self.i_head(x, train=train)

    def forward_train(self, inputs, gt_semantic_seg, meta_infos=None,
                      rescale: bool = False, train: bool = True):
        assert isinstance(inputs, (list, tuple)) and len(inputs) == 3, (
            "PIDHead expects the PIDNet (x_p, x_d, merged) triple")
        x_p, x_d, x = inputs
        logit_i = self.i_head(x, train=train)
        logit_p = self.p_head(x_p, train=train)
        logit_d = self.d_head(x_d, train=train)

        label = gt_semantic_seg
        size = label.shape[1:3]
        up = dict(size=size, mode="bilinear", align_corners=self.align_corners)
        logit_i = resize(logit_i, **up)
        logit_p = resize(logit_p, **up)
        logit_d = resize(logit_d, **up)

        sem_p, sem_i, bd, sem_bd = self.losses_decode
        bd_label = boundary_from_label(label, self.edge_width,
                                       self.ignore_index)
        loss = dict()
        loss["loss_sem_p"] = sem_p(logit_p, label,
                                   ignore_index=self.ignore_index)
        loss["loss_sem_i"] = sem_i(logit_i, label,
                                   ignore_index=self.ignore_index)
        loss["loss_bd"] = bd(logit_d, bd_label)
        # boundary-aware CE: only pixels the D branch calls boundary
        conf = jax.nn.sigmoid(logit_d[..., 0]) > self.bd_confidence
        masked = jnp.where(conf, label, self.ignore_index)
        loss["loss_sem_bd"] = sem_bd(logit_i, masked,
                                     ignore_index=self.ignore_index)
        loss["acc_seg"] = accuracy(logit_i, label,
                                   ignore_index=self.ignore_index)

        ori_img_size = (meta_infos or {}).get("ori_img_size_hw", None)
        if rescale and ori_img_size and isinstance(ori_img_size, tuple):
            logit_i = resize(logit_i, size=ori_img_size, mode="bilinear",
                             align_corners=self.align_corners)
        return logit_i, loss
