"""OCRNet decode head (Yuan et al., ECCV 2020: "Object-Contextual
Representations for Semantic Segmentation").

Beyond-reference addition giving ``CascadeEncoderDecoder`` its canonical
production family: stage-0 produces coarse soft regions (an FCN head),
stage-1's OCRHead augments every pixel with an object-contextual vector.
The whole head is matmul algebra — made for the MXU:

* **Spatial gather**: per-class soft region pooling is one einsum —
  ``softmax_pixels(scale · logits)ᵀ · feats`` → (N, K, C) object
  representations (K = num_classes "region tokens").
* **Object attention**: pixel-query / region-key attention with K keys,
  i.e. an (HW × ocr)·(ocr × K) score matmul, f32 softmax over K, and an
  (HW × K)·(K × ocr) mixing matmul — tiny keys, huge batched MXU work on
  the pixel axis; all projections are 1x1 ConvModules (two-conv
  query/key stacks, single-conv value/out, matmul-normalized scores).
* Output = 1x1 bottleneck over ``concat(context, pixel feats)`` →
  ``cls_seg``.

The head declares ``takes_prev_logits = True``: the cascade passes
stage-k-1 logits as a separate ``prev_logits`` argument instead of
concatenating them onto the features.  ``scale > 1`` max-pools the
query map before attention and resizes the output back (the attention
itself is already linear in HW, so this is an accuracy/memory knob, not
a complexity fix).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from ..common.conv_module import ConvModule
from .decode_head import BaseDecodeHead


def spatial_gather(logits: jnp.ndarray, feats: jnp.ndarray,
                   scale: float = 1.0) -> jnp.ndarray:
    """Soft-region pooling: (N,H,W,K) logits + (N,h,w,C) feats → (N,K,C).

    The logits are resized to the feature grid if they differ, then
    softmaxed over PIXELS per class so each class's map is a convex
    pooling weight over the image."""
    if logits.shape[1:3] != feats.shape[1:3]:
        logits = resize(logits, size=feats.shape[1:3], mode="bilinear",
                        align_corners=False)
    N, H, W, K = logits.shape
    C = feats.shape[-1]
    probs = nn.softmax(scale * logits.reshape(N, H * W, K).astype(
        jnp.float32), axis=1)
    ctx = jnp.einsum("npk,npc->nkc", probs.astype(feats.dtype),
                     feats.reshape(N, H * W, C))
    return ctx


class ObjectAttentionBlock(nn.Module):
    """Pixel-to-region attention (the OCR 'object context' step)."""

    in_channels: int          # pixel/region feature width
    channels: int             # attention (ocr) width
    scale: int = 1
    conv_cfg: dict | None = None
    norm_cfg: dict | None = None
    act_cfg: dict | None = None

    @nn.compact
    def __call__(self, query_feats, key_feats, train: bool = False):
        """query_feats (N,H,W,C); key_feats (N,K,C) → (N,H,W,C)."""
        Cin, ch = self.in_channels, self.channels
        mods = dict(conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                    act_cfg=self.act_cfg)
        q_in = query_feats
        if self.scale > 1:
            q_in = nn.max_pool(q_in, (self.scale, self.scale),
                               strides=(self.scale, self.scale))
        q = ConvModule(Cin, ch, 1, name="query_project_0", **mods)(
            q_in, train=train)
        q = ConvModule(ch, ch, 1, name="query_project_1", **mods)(
            q, train=train)
        keys = key_feats[:, :, None, :]          # (N, K, 1, C) as a map
        k = ConvModule(Cin, ch, 1, name="key_project_0", **mods)(
            keys, train=train)
        k = ConvModule(ch, ch, 1, name="key_project_1", **mods)(
            k, train=train)[:, :, 0, :]
        v = ConvModule(Cin, ch, 1, name="value_project", **mods)(
            keys, train=train)[:, :, 0, :]

        scores = jnp.einsum("nhwc,nkc->nhwk", q, k,
                            preferred_element_type=jnp.float32)
        attn = nn.softmax(scores * (ch ** -0.5), axis=-1)
        ctx = jnp.einsum("nhwk,nkc->nhwc", attn.astype(v.dtype), v)
        ctx = ConvModule(ch, Cin, 1, name="out_project", **mods)(
            ctx, train=train)
        out = ConvModule(2 * Cin, Cin, 1, name="bottleneck", **mods)(
            jnp.concatenate([ctx, q_in], axis=-1), train=train)
        if self.scale > 1:
            out = resize(out, size=query_feats.shape[1:3], mode="bilinear",
                         align_corners=False)
        return out


@DECODEHEAD.register()
class OCRHead(BaseDecodeHead):
    ocr_channels: int = 256
    scale: int = 1

    takes_prev_logits = True  # cascade passes stage k-1 logits separately

    def setup(self):
        super().setup()
        mods = dict(conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                    act_cfg=self._act_cfg())
        self.bottleneck = ConvModule(self.fused_in_channels, self.channels,
                                     3, padding=1, name="feat_bottleneck",
                                     **mods)
        self.object_context_block = ObjectAttentionBlock(
            self.channels, self.ocr_channels, scale=self.scale,
            name="object_context_block", **mods)

    def __call__(self, inputs, train: bool = False, prev_logits=None):
        assert prev_logits is not None, (
            "OCRHead needs the previous cascade stage's logits "
            "(use it inside CascadeEncoderDecoder)")
        x = self._transform_inputs(inputs)
        feats = self.bottleneck(x, train=train)
        context = spatial_gather(prev_logits, feats, float(self.scale))
        obj = self.object_context_block(feats, context, train=train)
        return self.cls_seg(obj, train=train)
