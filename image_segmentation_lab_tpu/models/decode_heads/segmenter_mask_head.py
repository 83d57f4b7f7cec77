"""Segmenter mask-transformer decode head (Strudel et al., ICCV 2021).

Beyond-reference addition pairing the ViT backbone
(``models/backbones/vit.py``): instead of a conv classifier, K learnable
class embeddings join the patch tokens and co-attend through a small
transformer; the mask for class k is the (L2-normalized) dot product
between every patch token and class token k — segmentation as
token-to-class similarity (mmseg ``SegmenterMaskTransformerHead``
semantics).

TPU notes: the decoder reuses ``ViTBlock`` wholesale, so its attention
rides the same MXU-einsum/flash-kernel dispatch as the encoder
(``ops/attention.py``); the final patch x class similarity is one
(N, L, C) x (N, C, K) batched matmul.  Everything is static-shape: the
class tokens extend the sequence by a compile-time constant K.

Contract notes (mmseg parity, pinned by ``tests/test_segmenter.py``):

* ``proj_patch`` / ``proj_classes`` are raw (C, C) matrices initialized
  at std C^-1/2, no bias; applied BEFORE the L2 normalization.
* ``mask_norm`` is a LayerNorm over the K class logits.
* ``cls_emb`` is trunc-normal(0.02); drop-path ramps linearly over the
  decoder layers like the encoder.
* ``conv_seg`` from the base head is never called — the similarity IS
  the classifier (no params materialize for it under flax lazy init).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.initialize.init_functions import normal_, trunc_normal_
from ...core.registry_hub import DECODEHEAD
from ..backbones.vit import ViTBlock
from ..basic.convolution import Linear
from ..basic.normalization import LayerNorm
from ..basic.param_utils import create_param
from .decode_head import BaseDecodeHead

_W_INIT = trunc_normal_(0.0, 0.02)


@DECODEHEAD.register()
class SegmenterMaskTransformerHead(BaseDecodeHead):
    num_layers: int = 2
    num_heads: int = 6
    mlp_ratio: int = 4
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    attn_drop_rate: float = 0.0

    def setup(self):
        super().setup()
        C = self.channels
        K = self.resolved_out_channels()
        self.proj_dec = Linear(self.fused_in_channels, C,
                               weight_init=_W_INIT, name="proj_dec")
        self.cls_emb = create_param(self, "cls_emb", _W_INIT, (1, K, C),
                                    True)
        dpr = [self.drop_path_rate * i / max(self.num_layers - 1, 1)
               for i in range(self.num_layers)]
        self.layers = [
            ViTBlock(C, self.num_heads, mlp_ratio=self.mlp_ratio,
                     qkv_bias=self.qkv_bias, drop_rate=self.dropout_ratio,
                     attn_drop_rate=self.attn_drop_rate,
                     drop_path_rate=dpr[i], name=f"layer{i}")
            for i in range(self.num_layers)
        ]
        self.decoder_norm = LayerNorm(C, name="decoder_norm")
        scale = C ** -0.5
        self.proj_patch = create_param(self, "proj_patch",
                                       normal_(0.0, scale), (C, C), True)
        self.proj_classes = create_param(self, "proj_classes",
                                         normal_(0.0, scale), (C, C), True)
        self.mask_norm = LayerNorm(K, name="mask_norm")

    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)            # (N, H, W, C_in)
        N, H, W, _ = x.shape
        C = self.channels
        K = self.resolved_out_channels()
        x = self.proj_dec(x.reshape(N, H * W, self.fused_in_channels))
        cls = jnp.broadcast_to(self.cls_emb.astype(x.dtype), (N, K, C))
        x = jnp.concatenate([x, cls], axis=1)         # (N, L+K, C)
        for layer in self.layers:
            x = layer(x, train=train)
        x = self.decoder_norm(x)
        patches, cls_tok = x[:, :-K], x[:, -K:]
        patches = patches @ self.proj_patch.astype(patches.dtype)
        cls_tok = cls_tok @ self.proj_classes.astype(cls_tok.dtype)
        # L2-normalize in f32 (rsqrt of tiny sums underflows in bf16)
        patches = patches.astype(jnp.float32)
        cls_tok = cls_tok.astype(jnp.float32)
        patches = patches / jnp.linalg.norm(patches, axis=-1, keepdims=True)
        cls_tok = cls_tok / jnp.linalg.norm(cls_tok, axis=-1, keepdims=True)
        masks = jnp.einsum("nlc,nkc->nlk", patches, cls_tok,
                           preferred_element_type=jnp.float32)
        masks = self.mask_norm(masks)
        return masks.reshape(N, H, W, K)
