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

    def _embed(self, x):
        """Query embeddings → (cls logits, mask-embedding vectors)."""
        cls = self.cls_embed(self.decoder_norm(x))
        emb = self.decoder_norm(x)
        for i, fc in enumerate(self.mask_embed):
            emb = fc(emb)
            if i < 2:
                emb = nn.relu(emb)
        return cls, emb

    def _predict(self, x, mask_features):
        cls, emb = self._embed(x)
        masks = jnp.einsum("nqc,nhwc->nqhw", emb, mask_features)
        return cls, masks

    def _attn_blocked(self, emb, level_mask_feat):
        """Attention-blocked map at LEVEL resolution, computed directly
        from the (N, Q, C) mask embeddings and the level-resized mask
        features → (N, Q, h_l*w_l) bool.

        TPU-native restructure (upstream resizes each layer's
        1/4-resolution mask LOGITS down to the level): bilinear resize
        is linear in the channel dot product, so
        ``resize(einsum(emb, F)) == einsum(emb, resize(F))`` exactly —
        resizing the (N, h, w, C) mask features ONCE per level replaces
        a per-layer (N, Q, H/4, W/4) logit materialization + Q-channel
        resize, and at inference XLA then dead-code-eliminates every
        intermediate full-resolution prediction (only the last feeds
        the semantic output).  On its own a small win (133 → 136 img/s
        b16×640²); combined with the chunked cross-attention
        (``ops/attention.chunked_softmax_attention`` — the real
        bottleneck was an XLA lowering cliff in the monolithic masked
        attention) Mask2Former-R50 eval went **132 → 349 img/s**
        (docs/PERF.md round 4)."""
        m = jnp.einsum("nqc,nhwc->nqhw", emb, level_mask_feat)
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

        memories, mem_poss, level_mask_feats = [], [], []
        for li in range(S):
            lvl = levels[li]                      # coarsest first
            h, w = lvl.shape[1:3]
            pos = sine_positional_encoding(h, w, C // 2).astype(lvl.dtype)
            mem = lvl.reshape(N, h * w, C) + \
                self.level_embed[li].astype(lvl.dtype)
            memories.append(mem)
            mem_poss.append(pos.reshape(1, h * w, C))
            # mask features pre-resized to the level grid — the exact
            # commuted form of upstream's per-layer logit resize (see
            # _attn_blocked)
            level_mask_feats.append(resize(mask_features, size=(h, w),
                                           mode="bilinear",
                                           align_corners=False))

        query_pos = jnp.broadcast_to(
            self.query_embed[None].astype(mask_features.dtype),
            (N, self.num_queries, C))
        x = jnp.broadcast_to(
            self.query_feat[None].astype(mask_features.dtype),
            (N, self.num_queries, C))

        all_cls, all_embs = [], []
        cls0, emb0 = self._embed(x)
        all_cls.append(cls0)
        all_embs.append(emb0)
        for i, layer in enumerate(self.decoder_layers):
            li = i % S
            blocked = self._attn_blocked(all_embs[-1],
                                         level_mask_feats[li])
            x = layer(x, memories[li], query_pos, mem_poss[li], blocked,
                      train=train)
            cls_i, emb_i = self._embed(x)
            all_cls.append(cls_i)
            all_embs.append(emb_i)
        # full-resolution mask logits per prediction; at inference only
        # the last survives DCE (the blocked maps above no longer pin
        # the intermediates)
        all_masks = [jnp.einsum("nqc,nhwc->nqhw", emb, mask_features)
                     for emb in all_embs]
        return all_cls, all_masks
