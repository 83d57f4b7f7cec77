"""Expectation-Maximization attention decode head (EMANet — Li et al.,
ICCV 2019; mmseg ``EMAHead`` semantics).

Beyond-reference family.  Attention against K learned bases instead of
all HW positions: T rounds of EM — E-step: softmax responsibilities of
each pixel over the bases; M-step: bases re-estimated as the
responsibility-weighted pixel mean (L1-normalized over space), then
L2-normalized over channels — followed by a low-rank reconstruction
``bases @ attention^T``.  Cost O(HW·K·T) versus non-local's O((HW)²).

TPU notes: each EM round is two batched MXU einsums over (HW x C x K);
the round loop is a ``lax.fori_loop``-free Python unroll (T is 3 —
static).  Matching the original, the EM rounds run under
``stop_gradient`` (EM is not backpropped; gradients reach the input
convs through the residual identity), and the bases persist as a
**moving-average buffer** in the ``batch_stats`` collection — the same
mutable-variable mechanism as BN running stats, so the train step's
machinery updates it for free, and under a sharded jit the batch-mean
update is automatically the global mean (the reference ecosystem needs
an explicit ``all_reduce`` here; SPMD derives it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.initialize.init_functions import kaiming_
from ...core.registry_hub import DECODEHEAD
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


def _l2_normalize(x, axis, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


class EMAModule(nn.Module):
    channels: int
    num_bases: int = 64
    num_stages: int = 3
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        N, H, W, C = x.shape
        init = kaiming_(0.0, "fan_in", "relu", "normal")
        bases_var = self.variable(
            "batch_stats", "bases",
            lambda: _l2_normalize(
                init(jax.random.PRNGKey(0), (1, C, self.num_bases),
                     jnp.float32), axis=1))
        feats = x.reshape(N, H * W, C).astype(jnp.float32)
        bases = jnp.broadcast_to(bases_var.value, (N, C, self.num_bases))

        # EM rounds are not backpropped (original design)
        feats_sg = jax.lax.stop_gradient(feats)
        attention = None
        for _ in range(self.num_stages):
            # E-step: responsibilities over bases
            attention = nn.softmax(
                jnp.einsum("nlc,nck->nlk", feats_sg, bases), axis=2)
            # M-step: weighted pixel mean, L1 over space, L2 over channels
            attn_l1 = attention / jnp.maximum(
                jnp.sum(attention, axis=1, keepdims=True), 1e-12)
            bases = jnp.einsum("nlc,nlk->nck", feats_sg, attn_l1)
            bases = _l2_normalize(bases, axis=1)

        recon = jnp.einsum("nck,nlk->nlc", bases, attention)
        recon = recon.reshape(N, H, W, C).astype(x.dtype)

        if train and self.momentum > 0 and not self.is_initializing():
            # moving-average buffer update; the batch mean is global under
            # a sharded jit (SPMD inserts the cross-replica mean)
            batch_bases = _l2_normalize(
                jnp.mean(bases, axis=0, keepdims=True), axis=1)
            bases_var.value = ((1 - self.momentum) * bases_var.value
                               + self.momentum * batch_bases)
        return recon


@DECODEHEAD.register()
class EMAHead(BaseDecodeHead):
    ema_channels: int = 512
    num_bases: int = 64
    num_stages: int = 3
    momentum: float = 0.1
    concat_input: bool = True

    def setup(self):
        super().setup()
        self.ema_in_conv = ConvModule(
            self.fused_in_channels, self.ema_channels, 3, padding=1,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg())
        # the 1x1 feeding EM runs bare (no norm/act) like the original
        self.ema_mid_conv = ConvModule(
            self.ema_channels, self.ema_channels, 1,
            conv_cfg=self.conv_cfg, norm_cfg=None, act_cfg=None)
        self.ema_module = EMAModule(self.ema_channels, self.num_bases,
                                    self.num_stages, self.momentum)
        self.ema_out_conv = ConvModule(
            self.ema_channels, self.ema_channels, 1,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg, act_cfg=None)
        self.bottleneck = ConvModule(
            self.ema_channels, self.channels, 3, padding=1,
            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
            act_cfg=self._act_cfg())
        if self.concat_input:
            self.conv_cat = ConvModule(
                self.fused_in_channels + self.channels, self.channels, 3,
                padding=1, conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                act_cfg=self._act_cfg())

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        feats = self.ema_in_conv(x, train=train)
        identity = feats
        feats = self.ema_mid_conv(feats, train=train)
        recon = nn.relu(self.ema_module(feats, train=train))
        recon = self.ema_out_conv(recon, train=train)
        output = nn.relu(identity + recon)
        output = self.bottleneck(output, train=train)
        if self.concat_input:
            output = self.conv_cat(jnp.concatenate([x, output], axis=-1),
                                   train=train)
        return self.cls_seg(output, train=train)
