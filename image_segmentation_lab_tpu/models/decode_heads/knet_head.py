"""K-Net semantic segmentation head (Zhang et al., NeurIPS 2021 —
"K-Net: Towards Unified Image Segmentation"; mmseg ``IterativeDecodeHead``
+ ``KernelUpdateHead`` arrangement for the semantic task).

Beyond-reference addition.  A *kernel generate head* (any head in the
zoo — UPerNet/FCN) produces the stage-0 masks AND donates its 1x1
classifier weights as the initial per-class kernels; ``num_stages``
kernel-update stages then iteratively refine both:

1. **Group features**: hard-gated mask pooling — ``sigmoid(mask) *
   (sigmoid(mask) > 0.5)`` weights pool the feature map into one vector
   per kernel (a batched einsum, MXU).
2. **Adaptive kernel update** (``KernelUpdator``): the pooled group
   feature and the current kernel each emit in/out projections; two
   sigmoid gates (functions of their product) mix them — the K-Net
   "dynamic" rule that lets a kernel accept or reject image evidence.
3. **Kernel interaction**: multihead self-attention across the kernel
   set (kernels are L=num_classes tokens), then an FFN.
4. **New masks**: the updated kernels are applied as a dynamic 1x1
   conv — one einsum against the feature map.

Every stage is a fixed-shape jnp program (no per-image convs: the
dynamic conv is an einsum with the kernel batch dim), so the full
iterative head jits into one XLA computation.  Losses: the configured
``loss_decode`` evaluates every stage's masks (stage-0 from the
generate head included) with ``s{i}.``-prefixed keys, mirroring
upstream's stage-wise deep supervision; eval uses the final stage.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...core.initialize.init_functions import constant_, trunc_normal_
from ...utils.ops import resize
from ..backbones.vit import MultiheadAttention
from ..basic.convolution import Linear
from ..basic.normalization import LayerNorm
from ..builder import build_module_from_cfg
from ..losses import accuracy
from .decode_head import BaseDecodeHead

_W_INIT = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)


class KernelUpdator(nn.Module):
    """Gated fusion of a kernel with its mask-pooled group feature."""

    in_channels: int = 256
    feat_channels: int = 256

    @nn.compact
    def __call__(self, update_feature, input_feature, train: bool = False):
        # update_feature (N, K, C): group features; input_feature (N, K, C)
        C, F = self.in_channels, self.feat_channels
        params = Linear(C, 2 * F, weight_init=_W_INIT, bias_init=_ZEROS,
                        name="dynamic_layer")(update_feature)
        param_in, param_out = params[..., :F], params[..., F:]
        inputs = Linear(C, 2 * F, weight_init=_W_INIT, bias_init=_ZEROS,
                        name="input_layer")(input_feature)
        input_in, input_out = inputs[..., :F], inputs[..., F:]

        gate_feats = input_in * param_in
        input_gate = LayerNorm(F, name="input_norm_in")(
            Linear(F, F, weight_init=_W_INIT, bias_init=_ZEROS,
                   name="input_gate")(gate_feats))
        update_gate = LayerNorm(F, name="norm_in")(
            Linear(F, F, weight_init=_W_INIT, bias_init=_ZEROS,
                   name="update_gate")(gate_feats))
        input_gate = nn.sigmoid(input_gate)
        update_gate = nn.sigmoid(update_gate)

        param_out = LayerNorm(F, name="norm_out")(param_out)
        input_out = LayerNorm(F, name="input_norm_out")(input_out)
        feats = update_gate * param_out + input_gate * input_out
        feats = Linear(F, C, weight_init=_W_INIT, bias_init=_ZEROS,
                       name="fc_layer")(feats)
        feats = LayerNorm(C, name="fc_norm")(feats)
        return nn.relu(feats)


class KernelUpdateHead(nn.Module):
    """One K-Net refinement stage over (features, kernels, masks)."""

    num_classes: int
    in_channels: int = 256
    num_heads: int = 8
    num_mask_fcs: int = 1
    feedforward_channels: int = 2048
    dropout: float = 0.0
    mask_thr: float = 0.5

    @nn.compact
    def __call__(self, x, kernels, mask_preds, train: bool = False):
        # x (N,H,W,C); kernels (N,K,C); mask_preds (N,h,w,K) logits
        N, H, W, C = x.shape
        K = kernels.shape[1]
        if mask_preds.shape[1:3] != (H, W):
            gather_mask = resize(mask_preds, size=(H, W), mode="bilinear",
                                 align_corners=False)
        else:
            gather_mask = mask_preds
        sig = nn.sigmoid(gather_mask.astype(jnp.float32))
        sig = sig * (sig > self.mask_thr)            # hard gating (upstream)
        x_feat = jnp.einsum("nhwk,nhwc->nkc", sig.astype(x.dtype), x)

        obj = KernelUpdator(self.in_channels, self.in_channels,
                            name="kernel_update_conv")(
            x_feat, kernels, train=train)

        # kernel interaction: MHSA over the K kernel tokens + FFN
        y = MultiheadAttention(self.in_channels, self.num_heads,
                               proj_drop_rate=self.dropout,
                               name="attention")(obj, train=train)
        obj = LayerNorm(self.in_channels, name="attention_norm")(obj + y)
        y = Linear(self.in_channels, self.feedforward_channels,
                   weight_init=_W_INIT, bias_init=_ZEROS, name="ffn_fc1")(obj)
        y = nn.gelu(y, approximate=False)
        y = Linear(self.feedforward_channels, self.in_channels,
                   weight_init=_W_INIT, bias_init=_ZEROS, name="ffn_fc2")(y)
        obj = LayerNorm(self.in_channels, name="ffn_norm")(obj + y)

        mask_feat = obj
        for i in range(self.num_mask_fcs):
            mask_feat = Linear(self.in_channels, self.in_channels,
                               bias=False, weight_init=_W_INIT,
                               name=f"mask_fc{i}")(mask_feat)
            mask_feat = LayerNorm(self.in_channels, name=f"mask_norm{i}")(
                mask_feat)
            mask_feat = nn.relu(mask_feat)
        new_kernels = Linear(self.in_channels, self.in_channels,
                             weight_init=_W_INIT, bias_init=_ZEROS,
                             name="fc_mask")(mask_feat)

        # dynamic 1x1 conv: one einsum, batch dim carried
        new_masks = jnp.einsum("nhwc,nkc->nhwk", x, new_kernels)
        return new_masks, new_kernels


@DECODEHEAD.register()
class IterativeDecodeHead(BaseDecodeHead):
    """kernel_generate_head + num_stages KernelUpdateHeads.

    ``kernel_generate_head``: a full head config (UPerHead/FCNHead...)
    whose feature map (pre-classifier) and conv_seg weights seed the
    iteration.  ``kernel_update_head``: dict or list of per-stage dicts
    (KernelUpdateHead kwargs minus num_classes).
    """

    num_stages: int = 3
    kernel_generate_head: Optional[Dict] = None
    kernel_update_head: Any = None

    def setup(self):
        assert self.kernel_generate_head is not None
        assert self.num_classes is not None and self.num_classes >= 2, \
            "K-Net refines one kernel per class (no binary 1-channel mode)"
        gen_cfg = dict(self.kernel_generate_head)
        gen_cfg.setdefault("num_classes", self.num_classes)
        from ...core.registry_hub import DECODEHEAD as _DH
        self.generate_head = build_module_from_cfg(gen_cfg, _DH)
        from collections.abc import Mapping as _Mapping
        upd = self.kernel_update_head
        if upd is None:
            upd = [dict()] * self.num_stages
        elif isinstance(upd, _Mapping):   # flax freezes dict attributes
            upd = [dict(upd)] * self.num_stages
        assert len(upd) == self.num_stages
        ch = self.generate_head.channels
        self.update_heads = [
            KernelUpdateHead(num_classes=self.num_classes, in_channels=ch,
                             **{k: v for k, v in dict(cfg).items()
                                if k != "type"}, name=f"stage{i}")
            for i, cfg in enumerate(upd)
        ]
        # NOT super().setup(): the iterative head has no classifier of
        # its own (the generate head's conv_seg doubles as stage-0
        # classifier AND kernel seed) — only the loss machinery is kept
        from collections.abc import Mapping
        from .decode_head import _DEFAULT_LOSS
        from ..builder import build_loss
        losses_cfg = self.loss_decode
        if losses_cfg is _DEFAULT_LOSS:
            losses_cfg = dict(type="CrossEntropyLoss", use_sigmoid=False,
                              loss_weight=1.0)
        if isinstance(losses_cfg, Mapping):
            self.losses_decode = (build_loss(losses_cfg),)
        else:
            self.losses_decode = tuple(build_loss(l) for l in losses_cfg)

    def _iterate(self, inputs, train: bool):
        feats = self.generate_head._forward_feature(inputs, train=train)
        masks0 = self.generate_head.cls_seg(feats, train=train)
        # initial kernels: the generate head's classifier weights — the
        # same (1,1,C,K) tensor that just produced masks0, transposed to
        # (K, C) and broadcast over the batch (upstream seeds kernels
        # from conv_seg.weight identically)
        w = self.generate_head.conv_seg.variables["params"]["weight"]
        kernel_w = jnp.transpose(w[0, 0], (1, 0))          # (K, C)
        N = feats.shape[0]
        kernels = jnp.broadcast_to(kernel_w[None], (N,) + kernel_w.shape)
        kernels = kernels.astype(feats.dtype)
        stage_masks = [masks0]
        masks = masks0
        for head in self.update_heads:
            masks, kernels = head(feats, kernels, masks, train=train)
            stage_masks.append(masks)
        return stage_masks

    def __call__(self, inputs, train: bool = False):
        return self._iterate(inputs, train)[-1]

    def forward_train(self, inputs, gt_semantic_seg, meta_infos=None,
                      rescale: bool = False, train: bool = True):
        stage_masks = self._iterate(inputs, train)
        label = gt_semantic_seg
        loss = dict()
        final = None
        for i, masks in enumerate(stage_masks):
            logit = resize(masks, size=label.shape[1:3], mode="bilinear",
                           align_corners=self.align_corners)
            final = logit
            for loss_decode in self.losses_decode:
                key = f"s{i}.{loss_decode.loss_name}"
                value = loss_decode(logit, label,
                                    ignore_index=self.ignore_index)
                loss[key] = loss.get(key, 0) + value
        loss["acc_seg"] = accuracy(final, label,
                                   ignore_index=self.ignore_index)

        ori_img_size = (meta_infos or {}).get("ori_img_size_hw", None)
        if rescale and ori_img_size and isinstance(ori_img_size, tuple):
            final = resize(final, size=ori_img_size, mode="bilinear",
                           align_corners=self.align_corners)
        return final, loss
