"""Dual-attention decode head (DAHead — DANet, Fu et al., CVPR 2019;
mmseg ``DAHead`` semantics).

Beyond-reference family.  Two attention branches over the backbone's
1/8-scale map, fused by summation, each with its own classifier:

* **PAM** (position attention): pixel-to-pixel affinity — query/key are
  C/8-dim 1x1 projections, softmax over the L=H*W key axis, value C-dim;
  out = gamma * attn(V) + x with gamma a scalar starting at 0.
* **CAM** (channel attention): channel-to-channel affinity on the raw
  features — energy = X X^T over channels, attention =
  softmax(max(energy) - energy) (the paper's inverted-distance form),
  gamma-scaled residual.

Everything is batched MXU einsums in NHWC: PAM's (L x d)(d x L) and
CAM's (C x L)(L x C) products both put a long reduction axis through
the systolic array with f32 accumulation; no score tensor survives to
HBM after fusion at these head sizes.

Training returns three logit sets — fused (pam_cam), pam-only,
cam-only — each through the full loss stack with mmseg's ``pam``/``cam``
key prefixes; inference uses the fused output only.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import constant_, normal_
from ...core.registry_hub import DECODEHEAD
from ..basic.convolution import Conv2d
from ..basic.param_utils import create_param
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


class PAM(nn.Module):
    """Position attention module (paper §3.2)."""

    in_channels: int
    channels: int                     # query/key dim (C // 8 in the paper)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, H, W, C = x.shape
        q = Conv2d(C, self.channels, 1, bias=False, name="query")(x)
        k = Conv2d(C, self.channels, 1, bias=False, name="key")(x)
        v = Conv2d(C, C, 1, bias=False, name="value")(x)
        L = H * W
        q = q.reshape(N, L, self.channels)
        k = k.reshape(N, L, self.channels)
        v = v.reshape(N, L, C)
        attn = nn.softmax(jnp.einsum("nld,nsd->nls", q, k,
                                     preferred_element_type=jnp.float32),
                          axis=-1)
        out = jnp.einsum("nls,nsc->nlc", attn.astype(v.dtype), v)
        gamma = create_param(self, "gamma", constant_(0.0), (), True)
        return gamma.astype(x.dtype) * out.reshape(N, H, W, C) + x


class CAM(nn.Module):
    """Channel attention module (paper §3.3)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, H, W, C = x.shape
        flat = x.reshape(N, H * W, C)
        energy = jnp.einsum("nlc,nld->ncd", flat, flat,
                            preferred_element_type=jnp.float32)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum("ncd,nld->nlc", attn.astype(flat.dtype), flat)
        gamma = create_param(self, "gamma", constant_(0.0), (), True)
        return gamma.astype(x.dtype) * out.reshape(N, H, W, C) + x


@DECODEHEAD.register()
class DAHead(BaseDecodeHead):
    pam_channels: int = None          # query/key dim; mmseg passes C // 8

    def setup(self):
        assert self.pam_channels is not None, "pam_channels is required"
        super().setup()
        mk = dict(conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                  act_cfg=self._act_cfg())
        self.pam_in_conv = ConvModule(self.fused_in_channels, self.channels,
                                      3, padding=1, **mk)
        self.pam = PAM(self.channels, self.pam_channels)
        self.pam_out_conv = ConvModule(self.channels, self.channels, 3,
                                       padding=1, **mk)
        self.pam_conv_seg = Conv2d(self.channels,
                                   self.resolved_out_channels(), 1,
                                   weight_init=normal_(0, 0.01),
                                   bias_init=constant_(0.0))
        self.cam_in_conv = ConvModule(self.fused_in_channels, self.channels,
                                      3, padding=1, **mk)
        self.cam = CAM()
        self.cam_out_conv = ConvModule(self.channels, self.channels, 3,
                                       padding=1, **mk)
        self.cam_conv_seg = Conv2d(self.channels,
                                   self.resolved_out_channels(), 1,
                                   weight_init=normal_(0, 0.01),
                                   bias_init=constant_(0.0))

    def _aux_cls_seg(self, feat, conv, train: bool):
        if self.dropout is not None:
            feat = self.dropout(feat, train=train)
        return conv(feat)

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        pam_feat = self.pam_out_conv(self.pam(self.pam_in_conv(x,
                                                               train=train)),
                                     train=train)
        cam_feat = self.cam_out_conv(self.cam(self.cam_in_conv(x,
                                                               train=train)),
                                     train=train)
        pam_cam = self.cls_seg(pam_feat + cam_feat, train=train)
        pam_out = self._aux_cls_seg(pam_feat, self.pam_conv_seg, train)
        cam_out = self._aux_cls_seg(cam_feat, self.cam_conv_seg, train)
        return pam_cam, pam_out, cam_out

    def forward_test(self, inputs, train: bool = False):
        """Inference uses the fused pam_cam logits only (mmseg parity)."""
        return self(inputs, train=train)[0]

    def forward_train(self, inputs, gt_semantic_seg, meta_infos=None,
                      rescale: bool = False, train: bool = True):
        pam_cam, pam_out, cam_out = self(inputs, train=train)
        logits, losses = self.losses(pam_cam, gt_semantic_seg, meta_infos,
                                     rescale=rescale)
        for name, logit in (("pam", pam_out), ("cam", cam_out)):
            _, aux = self.losses(logit, gt_semantic_seg)
            losses.update({f"{name}.{k}": v for k, v in aux.items()})
        return logits, losses
