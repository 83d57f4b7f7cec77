"""MaskFormer head (Cheng et al., NeurIPS 2021 — "Per-Pixel
Classification is Not All You Need"; mmseg ``MaskFormerHead``
arrangement for the semantic task).

Beyond-reference addition: mask classification.  N learned queries each
predict a (class, mask) pair; semantic output is the query-weighted
combination.  Pieces, all static-shape jnp:

* **PixelDecoder**: FPN-style top-down path (1x1 GN laterals + 3x3 GN
  output convs) from the backbone pyramid; emits the 1/4 ``mask
  features`` and passes the coarsest level as transformer ``memory``.
* **Transformer decoder**: ``num_layers`` post-norm DETR layers — query
  self-attention, query→memory cross-attention (sinusoidal 2-D position
  encoding on memory, learned query embeddings added to q/k, DETR
  convention), FFN.  All attention is batched MXU einsums with f32
  softmax (`ops/attention.py` contract).
* **Heads**: a linear classifier to ``num_classes + 1`` (+ "no object")
  and a 3-layer mask-embed MLP; mask logits are one einsum of the
  embeds against the mask features.
* **Matching + losses**: ground-truth segments for semantic data are
  the present classes (≤ num_classes), so targets live in exactly
  ``num_classes`` padded slots with a validity mask — static shapes.
  The assignment cost (−p_class + 20·focal + 1·dice, upstream weights)
  is matched per image by the ON-DEVICE auction algorithm
  (`ops/matching.py`), vmapped over the batch, inside the jitted step
  — no host callback (torch stacks run scipy on host here).  Losses:
  CE over all queries (no-object class weight 0.1), sigmoid focal (or
  plain BCE, ``mask_loss_type='ce'`` — Mask2Former's form) + dice on
  matched masks, deep supervision over every decoder layer
  (``d{i}.``-prefixed keys).  With ``num_points > 0`` the mask losses
  run the upstream point-sampled arrangement: per-pair
  importance-sampled loss points (oversample → keep the most
  boundary-uncertain → fill uniformly; one batched 2x2-patch gather
  per sampling, `ops/point_sample.py`), targets read from
  full-resolution gt.  The MATCHING costs run densely over the mask
  grid — the exact zero-variance expectation of upstream's
  shared-uniform-point estimate, and MXU einsums instead of gathers
  (see _layer_loss; docs/PERF.md round 5).

Eval: semantic probabilities ``p = softmax(cls)[..., :-1] ·
sigmoid(masks)``; the head returns ``log(p + eps)`` so the segmentor's
downstream softmax recovers exactly the normalized ``p`` (monotone —
argmax/mIoU semantics preserved through whole/slide/TTA paths).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.registry_hub import DECODEHEAD
from ...core.initialize.init_functions import constant_, trunc_normal_
from ...ops.attention import (_CHUNKED_MAX_LQ, _CHUNKED_MIN_SCORES,
                              chunked_softmax_attention)
from ...ops.matching import auction_assignment
from ...ops.point_sample import point_sample
from ...utils.ops import resize
from ..basic.convolution import Conv2d, Linear
from ..basic.normalization import LayerNorm
from ..common.conv_module import ConvModule
from ..losses import accuracy
from .decode_head import BaseDecodeHead

_W_INIT = trunc_normal_(0.0, 0.02)
_ZEROS = constant_(0.0)


def sine_positional_encoding(H: int, W: int, num_feats: int = 128,
                             temperature: int = 10000,
                             scale: float = 2 * math.pi) -> jnp.ndarray:
    """(H, W, 2*num_feats) sinusoidal 2-D embedding (normalized, the
    mmdet ``SinePositionalEncoding`` formula)."""
    eps = 1e-6
    y = (jnp.arange(1, H + 1, dtype=jnp.float32)[:, None]
         / (H + eps) * scale) * jnp.ones((1, W))
    x = (jnp.arange(1, W + 1, dtype=jnp.float32)[None, :]
         / (W + eps) * scale) * jnp.ones((H, 1))
    dim_t = temperature ** (2 * (jnp.arange(num_feats) // 2) / num_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(H, W, num_feats)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(H, W, num_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class CrossAttention(nn.Module):
    """q from one stream, k/v from another (torch nn.MultiheadAttention
    with separate projections; math-identical layout)."""

    embed_dims: int
    num_heads: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in, train: bool = False,
                 blocked=None):
        """``blocked`` (N, Lq, Lk) bool: True keys get −inf score (the
        Mask2Former masked attention); rows that block everything fall
        back to full attention (upstream safeguard)."""
        C, h = self.embed_dims, self.num_heads
        d = C // h
        N, Lq = q_in.shape[:2]
        Lk = k_in.shape[1]
        q = Linear(C, C, weight_init=_W_INIT, bias_init=_ZEROS,
                   name="q_proj")(q_in).reshape(N, Lq, h, d)
        k = Linear(C, C, weight_init=_W_INIT, bias_init=_ZEROS,
                   name="k_proj")(k_in).reshape(N, Lk, h, d)
        v = Linear(C, C, weight_init=_W_INIT, bias_init=_ZEROS,
                   name="v_proj")(v_in).reshape(N, Lk, h, d)
        if (N * h * Lq * Lk >= _CHUNKED_MIN_SCORES
                and Lq <= _CHUNKED_MAX_LQ):
            # above the measured tiny-Lq XLA cliff (25 ms -> ~1 ms on
            # Mask2Former's 1/8-level masked cross-attention; see
            # ops/attention.chunked_softmax_attention + docs/PERF.md)
            out = chunked_softmax_attention(q, k, v, 1.0 / math.sqrt(d),
                                            blocked=blocked)
        else:
            scores = jnp.einsum("nlhd,nshd->nhls", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(d)
            if blocked is not None:
                keep = ~blocked | jnp.all(blocked, axis=-1, keepdims=True)
                scores = jnp.where(keep[:, None], scores, -1e30)
            attn = nn.softmax(scores, axis=-1)
            out = jnp.einsum("nhls,nshd->nlhd", attn.astype(v.dtype), v)
        return Linear(C, C, weight_init=_W_INIT, bias_init=_ZEROS,
                      name="out_proj")(out.reshape(N, Lq, C))


class DETRDecoderLayer(nn.Module):
    """Post-norm DETR decoder layer (self-attn, cross-attn, FFN)."""

    embed_dims: int
    num_heads: int
    feedforward_channels: int

    @nn.compact
    def __call__(self, x, memory, query_pos, mem_pos, train: bool = False):
        C = self.embed_dims
        y = CrossAttention(C, self.num_heads, name="self_attn")(
            x + query_pos, x + query_pos, x, train=train)
        x = LayerNorm(C, name="norm1")(x + y)
        y = CrossAttention(C, self.num_heads, name="cross_attn")(
            x + query_pos, memory + mem_pos, memory, train=train)
        x = LayerNorm(C, name="norm2")(x + y)
        y = Linear(C, self.feedforward_channels, weight_init=_W_INIT,
                   bias_init=_ZEROS, name="ffn_fc1")(x)
        y = Linear(self.feedforward_channels, C, weight_init=_W_INIT,
                   bias_init=_ZEROS, name="ffn_fc2")(nn.relu(y))
        return LayerNorm(C, name="norm3")(x + y)


class PixelDecoder(nn.Module):
    """FPN top-down path → (mask_features @1/4, memory = coarsest)."""

    in_channels: Sequence[int]
    feat_channels: int
    out_channels: int
    norm_cfg: Optional[Dict] = None

    def setup(self):
        ncfg = dict(self.norm_cfg or dict(type="GN", num_groups=32))
        L = len(self.in_channels)
        self.laterals = [
            ConvModule(self.in_channels[i], self.feat_channels, 1,
                       norm_cfg=dict(ncfg), act_cfg=None,
                       name=f"lateral{i}")
            for i in range(L - 1)
        ]
        self.outputs = [
            ConvModule(self.feat_channels, self.feat_channels, 3, padding=1,
                       norm_cfg=dict(ncfg), act_cfg=dict(type="ReLU"),
                       name=f"output{i}")
            for i in range(L - 1)
        ]
        self.last_feat_conv = ConvModule(
            self.in_channels[-1], self.feat_channels, 3, padding=1,
            norm_cfg=dict(ncfg), act_cfg=dict(type="ReLU"))
        self.mask_feature = Conv2d(self.feat_channels, self.out_channels, 3,
                                   padding=1, weight_init=_W_INIT,
                                   bias_init=_ZEROS)

    def __call__(self, feats, train: bool = False,
                 return_multi_scale: bool = False):
        y = self.last_feat_conv(feats[-1], train=train)
        levels = [y]                      # coarsest-first top-down taps
        for i in range(len(feats) - 2, -1, -1):
            lat = self.laterals[i](feats[i], train=train)
            y = lat + resize(y, size=lat.shape[1:3], mode="bilinear",
                             align_corners=False)
            y = self.outputs[i](y, train=train)
            levels.append(y)
        mask_feature = self.mask_feature(y, train=train)
        if return_multi_scale:
            return mask_feature, levels
        return mask_feature, feats[-1]


def _focal_cost(mask_logits, gt_masks, alpha=0.25, gamma=2.0):
    """(Q, P) sigmoid-focal pair cost vs (T, P) binary masks → (T, Q),
    averaged over pixels (mmdet FocalLossCost binary_input formula)."""
    eps = 1e-12
    p = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma          # (Q, P)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    g = gt_masks.astype(jnp.float32)
    cost = jnp.einsum("qp,tp->tq", pos, g) + jnp.einsum(
        "qp,tp->tq", neg, 1 - g)
    return cost / mask_logits.shape[-1]


def _dice_cost(mask_logits, gt_masks, eps=1e-3):
    """(T, Q) dice pair cost (mmdet DiceCost, activate=sigmoid)."""
    p = jax.nn.sigmoid(mask_logits.astype(jnp.float32))         # (Q, P)
    g = gt_masks.astype(jnp.float32)                            # (T, P)
    inter = 2 * jnp.einsum("qp,tp->tq", p, g)
    denom = p.sum(-1)[None, :] + g.sum(-1)[:, None]
    return 1 - (inter + eps) / (denom + eps)


def _bce_cost(mask_logits, gt_masks):
    """(T, Q) pair cost: per-point binary CE averaged over points
    (mmdet CrossEntropyLossCost with binary_input=True — Mask2Former's
    mask matching cost; MaskFormer uses the focal variant above)."""
    x = mask_logits.astype(jnp.float32)                         # (Q, P)
    pos = jax.nn.softplus(-x)       # -log sigmoid(x)
    neg = jax.nn.softplus(x)        # -log(1 - sigmoid(x))
    g = gt_masks.astype(jnp.float32)                            # (T, P)
    cost = jnp.einsum("qp,tp->tq", pos, g) + jnp.einsum(
        "qp,tp->tq", neg, 1 - g)
    return cost / mask_logits.shape[-1]


def panoptic_from_probs(probs, mask_probs,
                        object_mask_threshold: float = 0.8,
                        overlap_threshold: float = 0.8):
    """Panoptic competition on query-level probabilities — a free
    function (pure jnp, no parameters) so consumers can run it on
    TTA-AVERAGED ``(probs, mask_probs)`` (``val.py --panoptic --tta``)
    exactly as the head runs it on single-view ones.

    probs (N, Q, K+1) softmax class probabilities (last column = "no
    object"); mask_probs (N, Q, H, W) sigmoid mask probabilities.
    Returns the ``(query_id, labels, keep)`` triple of
    ``MaskFormerHead.panoptic_map``, at the mask_probs resolution."""
    K = probs.shape[-1] - 1
    scores = jnp.max(probs[..., :-1], axis=-1)            # (N, Q)
    labels = jnp.argmax(probs[..., :-1], axis=-1).astype(jnp.int32)
    is_object = jnp.argmax(probs, axis=-1) != K
    keep = is_object & (scores > object_mask_threshold)

    weighted = mask_probs * scores[:, :, None, None]
    weighted = jnp.where(keep[:, :, None, None], weighted, -1.0)
    query_id = jnp.argmax(weighted, axis=1).astype(jnp.int32)
    any_kept = jnp.any(keep, axis=1)[:, None, None]

    # overlap filter: kept area after competition / own mask area
    binary = (mask_probs >= 0.5) & keep[:, :, None, None]
    won = query_id[:, None] == jnp.arange(
        mask_probs.shape[1])[None, :, None, None]
    kept_area = jnp.sum(binary & won, axis=(2, 3))
    own_area = jnp.maximum(jnp.sum(binary, axis=(2, 3)), 1)
    keep = keep & (kept_area / own_area > overlap_threshold) \
        & (kept_area > 0)

    valid_px = any_kept & jnp.take_along_axis(
        keep, query_id.reshape(keep.shape[0], -1), axis=1
    ).reshape(query_id.shape)
    query_id = jnp.where(valid_px, query_id, -1)
    return query_id, labels, keep


def _sample_rows(maps, pts):
    """Bilinear-sample row r of ``maps`` (R, h, w) at its own points
    ``pts[r]`` ((R, P, 2), normalized xy) → (R, P)."""
    return jax.vmap(
        lambda m, p: point_sample(m[None, :, :, None], p[None])[0, :, 0]
    )(maps, pts)


@DECODEHEAD.register()
class MaskFormerHead(BaseDecodeHead):
    """in_channels: backbone pyramid widths; channels: embed width."""

    num_queries: int = 100
    num_decoder_layers: int = 6
    num_heads: int = 8
    feedforward_channels: int = 2048
    feat_channels: Optional[int] = None      # pixel-decoder width
    # loss weights (upstream maskformer defaults)
    cls_weight: float = 1.0
    mask_weight: float = 20.0
    dice_weight: float = 1.0
    no_object_weight: float = 0.1
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # mask-loss form: 'focal' (MaskFormer) or 'ce' (Mask2Former's plain
    # sigmoid BCE) — applied to BOTH the pair cost and the loss
    mask_loss_type: str = "focal"
    # >0 enables upstream Mask2Former's point-sampled mask losses:
    # matching costs on num_points shared uniform points, mask/dice
    # losses on per-pair importance-sampled points (oversample by
    # oversample_ratio, keep the importance_sample_ratio most uncertain,
    # fill the rest uniformly).  0 keeps the exact dense losses.  The
    # point path also samples targets from the FULL-resolution gt
    # (no 0.5-threshold downsampling), matching upstream semantics.
    num_points: int = 0
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75

    def setup(self):
        assert self.input_transform == "multiple_select", \
            "MaskFormerHead consumes the backbone pyramid"
        assert self.out_channels in (None, self.num_classes), \
            "mask classification has no binary 1-channel mode"
        C = self.channels
        fc = self.feat_channels or C
        # upstream pins GN(32); adapt the group count for thin test widths
        gn = dict(type="GN", num_groups=math.gcd(32, fc))
        self.pixel_decoder = PixelDecoder(self.in_channels, fc, C,
                                          norm_cfg=gn)
        if self._uses_raw_memory:
            self.memory_proj = Conv2d(self.in_channels[-1], C, 1,
                                      weight_init=_W_INIT, bias_init=_ZEROS)
        from ..basic.param_utils import create_param
        self.query_embed = create_param(self, "query_embed", _W_INIT,
                                        (self.num_queries, C), True)
        self.decoder_layers = self._make_decoder_layers()
        self.decoder_norm = LayerNorm(C, name="decoder_norm")
        self.cls_embed = Linear(C, self.num_classes + 1,
                                weight_init=_W_INIT, bias_init=_ZEROS)
        self.mask_embed = [
            Linear(C, C, weight_init=_W_INIT, bias_init=_ZEROS,
                   name=f"mask_embed{i}")
            for i in range(3)
        ]
        # no conv_seg and no loss_decode: queries classify, and the
        # matching losses (CE + focal + dice with upstream weights) are
        # the head's own — see _layer_loss

    # subclass hooks (Mask2Former swaps the layer type and reads memory
    # from the pixel decoder instead of the raw C5)
    _uses_raw_memory = True

    def _make_decoder_layers(self):
        return [
            DETRDecoderLayer(self.channels, self.num_heads,
                             self.feedforward_channels, name=f"layer{i}")
            for i in range(self.num_decoder_layers)
        ]

    def _check_inputs(self):
        assert isinstance(self.in_channels, (list, tuple))

    # ------------------------------------------------------------ forward
    def _forward_all(self, inputs, train: bool):
        feats = [inputs[i] for i in self.in_index]
        mask_features, memory = self.pixel_decoder(feats, train=train)
        mh, mw = memory.shape[1:3]
        C = self.channels
        mem_pos = sine_positional_encoding(mh, mw, C // 2).astype(
            memory.dtype).reshape(1, mh * mw, C)
        memory = self.memory_proj(memory, train=train).reshape(
            memory.shape[0], mh * mw, C)
        N = memory.shape[0]
        query_pos = jnp.broadcast_to(
            self.query_embed[None].astype(memory.dtype),
            (N, self.num_queries, C))
        x = jnp.zeros_like(query_pos)

        outs = []
        for layer in self.decoder_layers:
            x = layer(x, memory, query_pos, mem_pos, train=train)
            outs.append(self.decoder_norm(x))

        all_cls, all_masks = [], []
        for out in outs:
            all_cls.append(self.cls_embed(out))              # (N, Q, K+1)
            emb = out
            for i, fc in enumerate(self.mask_embed):
                emb = fc(emb)
                if i < 2:
                    emb = nn.relu(emb)
            all_masks.append(jnp.einsum("nqc,nhwc->nqhw", emb,
                                        mask_features))
        return all_cls, all_masks

    def _semantic_logits(self, cls_scores, mask_preds):
        """Combine the final layer into per-pixel log-probabilities."""
        probs = jax.nn.softmax(cls_scores.astype(jnp.float32),
                               axis=-1)[..., :-1]            # drop no-object
        masks = jax.nn.sigmoid(mask_preds.astype(jnp.float32))
        sem = jnp.einsum("nqk,nqhw->nhwk", probs, masks)
        return jnp.log(sem + 1e-8)

    def __call__(self, inputs, train: bool = False):
        all_cls, all_masks = self._forward_all(inputs, train)
        return self._semantic_logits(all_cls[-1], all_masks[-1])

    def instance_results(self, inputs, score_threshold: float = 0.0,
                         train: bool = False):
        """Per-query mask-classification results (the raw form panoptic/
        instance consumers want; upstream exposes the same triple):
        ``(labels (N,Q) int — argmax class, scores (N,Q) f32 — that
        class's probability zeroed below ``score_threshold`` or when the
        argmax is "no object", masks (N,Q,H,W) bool — sigmoid > 0.5)``.
        Static shapes: Q slots always come back; filter by ``scores >
        0``."""
        all_cls, all_masks = self._forward_all(inputs, train)
        probs = jax.nn.softmax(all_cls[-1].astype(jnp.float32), axis=-1)
        labels = jnp.argmax(probs[..., :-1], axis=-1)
        scores = jnp.max(probs[..., :-1], axis=-1)
        is_object = jnp.argmax(probs, axis=-1) != self.num_classes
        scores = jnp.where(is_object & (scores > score_threshold),
                           scores, 0.0)
        masks = jax.nn.sigmoid(all_masks[-1].astype(jnp.float32)) > 0.5
        return labels, scores, masks

    def query_probs(self, inputs, train: bool = False):
        """The TTA-averageable query-level quantities: ``(probs
        (N, Q, K+1) f32 softmax class probabilities, mask_probs
        (N, Q, h, w) f32 sigmoid mask probabilities)``.  Queries are
        deterministic slots — the same learned embeddings process every
        input — so averaging per-query across TTA views is
        well-defined (``val.py --panoptic --tta``)."""
        all_cls, all_masks = self._forward_all(inputs, train)
        probs = jax.nn.softmax(all_cls[-1].astype(jnp.float32), axis=-1)
        mask_probs = jax.nn.sigmoid(all_masks[-1].astype(jnp.float32))
        return probs, mask_probs

    def panoptic_map(self, inputs, object_mask_threshold: float = 0.8,
                     overlap_threshold: float = 0.8, train: bool = False):
        """Standard MaskFormer panoptic post-processing (the detectron2
        / mmdet recipe), static shapes throughout.

        Queries above ``object_mask_threshold`` confidence compete per
        pixel with score-weighted mask probabilities; a winning query
        keeps its segment only if it retains more than
        ``overlap_threshold`` of its own thresholded mask after the
        argmax competition (fragmented queries are dropped).

        Returns ``(query_id (N,H,W) int32 — winning query per pixel or
        −1 for void, labels (N,Q) int32, keep (N,Q) bool)``; consumers
        build panoptic ids as ``labels[query_id] * OFFSET +
        instance_rank`` and mask out ``query_id == -1``.
        """
        probs, mask_probs = self.query_probs(inputs, train)
        return panoptic_from_probs(probs, mask_probs,
                                   object_mask_threshold,
                                   overlap_threshold)

    # ------------------------------------------------------------- losses
    def _layer_loss(self, cls_scores, mask_preds, gt_masks, valid,
                    key=None, gt_match=None):
        """Single-image loss; vmapped over the batch.

        cls_scores (Q, K+1); mask_preds (Q, h, w); gt_masks (K, H, W)
        binary per-class maps (any resolution — the dense path needs it
        to equal the mask resolution; the point path samples it in
        normalized coords); valid (K,) presence; key enables the
        point-sampled path when num_points > 0; gt_match (K, h, w) soft
        (bilinear-downsampled) targets for the dense matching costs of
        the point path."""
        K = self.num_classes
        Q = self.num_queries
        sampled = self.num_points > 0 and key is not None
        if sampled:
            k_os, k_rand = jax.random.split(key, 2)
            Pn = self.num_points
            # matching costs DENSELY over the mask grid.  Upstream
            # estimates the per-pair cost by Monte Carlo on num_points
            # shared uniform points (a GPU-memory tactic); the mean
            # over ALL grid points is that estimator's exact
            # expectation with zero variance, and on this chip it is
            # also ~6x cheaper: the pair costs are (Q,P)x(K,P) MXU
            # einsums, while the point estimate pays index-count-bound
            # gathers (docs/PERF.md round 5 — the matching gathers
            # were part of a 583 ms/step point-loss forward).  Matching
            # is argmin + stop_gradient, so only the assignment (not
            # the objective) consumes these costs.
            mp = mask_preds.reshape(Q, -1)
            gm = gt_match.reshape(K, -1)
        else:
            P = mask_preds.shape[-2] * mask_preds.shape[-1]
            mp = mask_preds.reshape(Q, P)
            gm = gt_masks.reshape(K, P)

        mask_cost = (_bce_cost(mp, gm) if self.mask_loss_type == "ce"
                     else _focal_cost(mp, gm, self.focal_alpha,
                                      self.focal_gamma))
        probs = jax.nn.softmax(cls_scores.astype(jnp.float32), axis=-1)
        cls_cost = -probs[:, :K].T                            # (K, Q)
        cost = (self.cls_weight * cls_cost
                + self.mask_weight * mask_cost
                + self.dice_weight * _dice_cost(mp, gm))
        cost = jax.lax.stop_gradient(cost)
        col, _ = auction_assignment(cost, valid_rows=valid)
        # a valid row can in principle exit unassigned (col == -1) if the
        # auction hits max_iters; negative indices WRAP in jax scatter
        # (even mode='drop') and gather, so gate every use on `matched`
        matched = valid & (col >= 0)
        col = jnp.where(matched, col, 0)

        # classification: matched queries get their class, rest no-object
        # (unmatched rows scatter to the out-of-range index Q → dropped,
        # so they can never collide with a real match on query 0)
        labels = jnp.full((Q,), K, jnp.int32)
        labels = labels.at[jnp.where(matched, col, Q)].set(
            jnp.arange(K), mode="drop")
        logp = jax.nn.log_softmax(cls_scores.astype(jnp.float32), axis=-1)
        cw = jnp.concatenate([jnp.ones((K,), jnp.float32),
                              jnp.full((1,), self.no_object_weight)])
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        ce = ce * cw[labels]
        loss_cls = ce.sum() / jnp.maximum(cw[labels].sum(), 1.0)

        # masks: focal/bce + dice on matched pairs only
        if sampled:
            # per-pair importance sampling (upstream
            # get_uncertain_point_coords_with_randomness): oversample,
            # keep the points nearest the decision boundary, fill the
            # rest uniformly; targets sampled from the full-res gt
            sel_maps = mask_preds[col]                        # (K, h, w)
            n_os = int(Pn * self.oversample_ratio)
            n_imp = int(Pn * self.importance_sample_ratio)
            os_pts = jax.random.uniform(k_os, (K, n_os, 2), jnp.float32)
            unc = -jnp.abs(jax.lax.stop_gradient(
                _sample_rows(sel_maps, os_pts)))
            _, top = jax.lax.top_k(unc, n_imp)                # (K, n_imp)
            imp_pts = jnp.take_along_axis(os_pts, top[..., None], axis=1)
            rand_pts = jax.random.uniform(k_rand, (K, Pn - n_imp, 2),
                                          jnp.float32)
            pts_l = jnp.concatenate([imp_pts, rand_pts], axis=1)
            sel = _sample_rows(sel_maps, pts_l)               # (K, Pn)
            g = _sample_rows(gt_masks.astype(jnp.float32), pts_l)
        else:
            sel = mp[col]                                     # (K, P)
            g = gm.astype(jnp.float32)
        sl32 = sel.astype(jnp.float32)
        p = jax.nn.sigmoid(sl32)
        if self.mask_loss_type == "ce":
            per_pt = (g * jax.nn.softplus(-sl32)
                      + (1 - g) * jax.nn.softplus(sl32))
        else:
            per_pt = (-g * jnp.log(p + 1e-12) * self.focal_alpha
                      * (1 - p) ** self.focal_gamma
                      - (1 - g) * jnp.log(1 - p + 1e-12)
                      * (1 - self.focal_alpha) * p ** self.focal_gamma)
        vf = matched.astype(jnp.float32)
        n_masks = jnp.maximum(vf.sum(), 1.0)
        loss_mask = (per_pt.mean(-1) * vf).sum() / n_masks
        inter = 2 * (p * g).sum(-1)
        dice = 1 - (inter + 1e-3) / (p.sum(-1) + g.sum(-1) + 1e-3)
        loss_dice = (dice * vf).sum() / n_masks
        return (self.cls_weight * loss_cls,
                self.mask_weight * loss_mask,
                self.dice_weight * loss_dice)

    def forward_train(self, inputs, gt_semantic_seg, meta_infos=None,
                      rescale: bool = False, train: bool = True):
        all_cls, all_masks = self._forward_all(inputs, train)
        label = gt_semantic_seg
        K = self.num_classes
        valid_px = label != self.ignore_index
        safe = jnp.where(valid_px, label, 0)
        onehot = jax.nn.one_hot(safe, K, axis=-1) * valid_px[..., None]
        valid = onehot.sum(axis=(1, 2)) > 0                   # (N, K)
        sampling = self.num_points > 0 and self.has_rng("dropout")
        if sampling:
            # point path: losses sample the FULL-res targets in
            # normalized coords — no downsampling approximation.  The
            # MATCHING costs run densely at mask resolution against
            # soft (area-mean) targets — see _layer_loss
            gt_for_loss = jnp.transpose(onehot, (0, 3, 1, 2))  # (N,K,H,W)
            h, w = all_masks[-1].shape[-2:]
            gt_match = jnp.transpose(
                resize(onehot, size=(h, w), mode="bilinear",
                       align_corners=False), (0, 3, 1, 2))     # (N,K,h,w)
            base_key = self.make_rng("dropout")
        else:
            # dense path: segment targets at the mask resolution
            # (area-preserving mean then 0.5 threshold)
            h, w = all_masks[-1].shape[-2:]
            gt_small = resize(onehot, size=(h, w), mode="bilinear",
                              align_corners=False) > 0.5
            gt_for_loss = jnp.transpose(gt_small, (0, 3, 1, 2))

        loss = dict()
        final = None
        N = label.shape[0]
        for li, (cls_s, mask_p) in enumerate(zip(all_cls, all_masks)):
            if sampling:  # fresh points per layer and per image
                keys = jax.random.split(jax.random.fold_in(base_key, li), N)
                lc, lm, ld = jax.vmap(self._layer_loss)(
                    cls_s, mask_p, gt_for_loss, valid, keys, gt_match)
            else:
                lc, lm, ld = jax.vmap(self._layer_loss)(cls_s, mask_p,
                                                        gt_for_loss, valid)
            tag = "" if li == len(all_cls) - 1 else f"d{li}."
            loss[f"{tag}loss_cls"] = lc.mean()
            loss[f"{tag}loss_mask"] = lm.mean()
            loss[f"{tag}loss_dice"] = ld.mean()
        sem = self._semantic_logits(all_cls[-1], all_masks[-1])
        sem = resize(sem, size=label.shape[1:3], mode="bilinear",
                     align_corners=self.align_corners)
        final = sem
        loss["acc_seg"] = accuracy(sem, label,
                                   ignore_index=self.ignore_index)
        ori_img_size = (meta_infos or {}).get("ori_img_size_hw", None)
        if rescale and ori_img_size and isinstance(ori_img_size, tuple):
            final = resize(final, size=ori_img_size, mode="bilinear",
                           align_corners=self.align_corners)
        return final, loss
