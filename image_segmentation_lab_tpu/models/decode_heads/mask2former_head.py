"""Mask2Former head (Cheng et al., CVPR 2022 — "Masked-attention Mask
Transformer for Universal Image Segmentation"; mmseg ``Mask2FormerHead``
arrangement for the semantic task).

Beyond-reference addition, built on the MaskFormer machinery
(`maskformer_head.py` — shared matcher, losses, combination).  The
Mask2Former deltas, all implemented:

* **Masked cross-attention**: each decoder layer attends only inside
  the foreground (sigmoid > 0.5) of the *previous* prediction's mask,
  per query — a boolean score mask on the cross-attention einsum; rows
  that would block everything fall back to full attention (upstream
  safeguard).  Cross-attention runs BEFORE self-attention.
* **Multi-scale round-robin memory**: layers cycle through the three
  coarsest pixel-decoder levels (1/32 → 1/16 → 1/8), each with its own
  sinusoidal position encoding plus a learned per-level embedding.
* **Learned query features**: the decoder starts from a learned
  ``query_feat`` (not zeros), and an extra prediction is emitted from
  it before the first layer (supervised like the rest).

Documented divergence from upstream (a static-shape/TPU choice): the
pixel decoder is this framework's FPN ``PixelDecoder`` rather than
mmdet's multi-scale-deformable-attention encoder (data-dependent
sampling points resist MXU tiling; the FPN variant is the original
MaskFormer's).  The mask losses follow the upstream point-sampled
arrangement when the config sets ``num_points`` (the shipped configs
use 12544 with sigmoid-BCE, cls 2.0 / mask 5.0 / dice 5.0, targets
sampled from full-resolution gt); ``num_points=0`` falls back to the
exact dense losses — both paths live in ``maskformer_head.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...utils.ops import resize
from ..basic.normalization import LayerNorm
from ..basic.convolution import Linear
from ..basic.param_utils import create_param
from .maskformer_head import (CrossAttention, MaskFormerHead, PixelDecoder,
                              _W_INIT, _ZEROS, sine_positional_encoding)


class Mask2FormerDecoderLayer(nn.Module):
    """Post-norm, cross-attention-first decoder layer."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int

    @nn.compact
    def __call__(self, x, memory, query_pos, mem_pos, blocked,
                 train: bool = False):
        C = self.embed_dims
        y = CrossAttention(C, self.num_heads, name="cross_attn")(
            x + query_pos, memory + mem_pos, memory, train=train,
            blocked=blocked)
        x = LayerNorm(C, name="norm1")(x + y)
        y = CrossAttention(C, self.num_heads, name="self_attn")(
            x + query_pos, x + query_pos, x, train=train)
        x = LayerNorm(C, name="norm2")(x + y)
        y = Linear(C, self.feedforward_channels, weight_init=_W_INIT,
                   bias_init=_ZEROS, name="ffn_fc1")(x)
        y = Linear(self.feedforward_channels, C, weight_init=_W_INIT,
                   bias_init=_ZEROS, name="ffn_fc2")(nn.relu(y))
        return LayerNorm(C, name="norm3")(x + y)


@DECODEHEAD.register()
class Mask2FormerHead(MaskFormerHead):
    num_scales: int = 3
    mask_attn_threshold: float = 0.5

    _uses_raw_memory = False   # memory = pixel-decoder levels

    def _make_decoder_layers(self):
        return [
            Mask2FormerDecoderLayer(self.channels, self.num_heads,
                                    self.feedforward_channels,
                                    name=f"layer{i}")
            for i in range(self.num_decoder_layers)
        ]

    def setup(self):
        super().setup()
        assert (self.feat_channels or self.channels) == self.channels, \
            "Mask2Former memory rides the pixel decoder: feat_channels " \
            "must equal channels"
        C = self.channels
        self.query_feat = create_param(self, "query_feat", _W_INIT,
                                       (self.num_queries, C), True)
        self.level_embed = create_param(self, "level_embed", _W_INIT,
                                        (self.num_scales, C), True)

    def _predict(self, x, mask_features):
        cls = self.cls_embed(self.decoder_norm(x))
        emb = self.decoder_norm(x)
        for i, fc in enumerate(self.mask_embed):
            emb = fc(emb)
            if i < 2:
                emb = nn.relu(emb)
        masks = jnp.einsum("nqc,nhwc->nqhw", emb, mask_features)
        return cls, masks

    def _attn_blocked(self, mask_logits, hw):
        """(N, Q, h, w) logits → (N, Q, h_l*w_l) bool blocked map at the
        target level resolution."""
        m = resize(jnp.transpose(mask_logits, (0, 2, 3, 1)), size=hw,
                   mode="bilinear", align_corners=False)
        m = jnp.transpose(m, (0, 3, 1, 2))
        blocked = jax.nn.sigmoid(m.astype(jnp.float32)) < \
            self.mask_attn_threshold
        return blocked.reshape(m.shape[0], m.shape[1], -1)

    def _forward_all(self, inputs, train: bool):
        feats = [inputs[i] for i in self.in_index]
        mask_features, levels = self.pixel_decoder(
            feats, train=train, return_multi_scale=True)
        C = self.channels
        S = min(self.num_scales, len(levels))
        N = mask_features.shape[0]

        memories, mem_poss, sizes = [], [], []
        for li in range(S):
            lvl = levels[li]                      # coarsest first
            h, w = lvl.shape[1:3]
            pos = sine_positional_encoding(h, w, C // 2).astype(lvl.dtype)
            mem = lvl.reshape(N, h * w, C) + \
                self.level_embed[li].astype(lvl.dtype)
            memories.append(mem)
            mem_poss.append(pos.reshape(1, h * w, C))
            sizes.append((h, w))

        query_pos = jnp.broadcast_to(
            self.query_embed[None].astype(mask_features.dtype),
            (N, self.num_queries, C))
        x = jnp.broadcast_to(
            self.query_feat[None].astype(mask_features.dtype),
            (N, self.num_queries, C))

        all_cls, all_masks = [], []
        cls0, masks0 = self._predict(x, mask_features)
        all_cls.append(cls0)
        all_masks.append(masks0)
        for i, layer in enumerate(self.decoder_layers):
            li = i % S
            blocked = self._attn_blocked(all_masks[-1], sizes[li])
            x = layer(x, memories[li], query_pos, mem_poss[li], blocked,
                      train=train)
            cls_i, masks_i = self._predict(x, mask_features)
            all_cls.append(cls_i)
            all_masks.append(masks_i)
        return all_cls, all_masks
