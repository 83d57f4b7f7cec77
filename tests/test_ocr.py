"""OCRHead: torch-golden numerics + cascade wiring tests
(beyond-reference family, models/decode_heads/ocr_head.py).

The torch twin re-derives the OCR forward semantics from the paper
(Yuan et al., ECCV 2020; mmseg OCRHead conventions): 3x3 bottleneck on
the fused features, per-class soft-region pooling with a pixel softmax,
pixel-to-region attention with two-conv query/key projections,
single-conv value/out projections, matmul-normalized scores, and the
2C->C bottleneck over concat(context, pixels) — with the SAME weights
pulled from the jax variable tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import (DECODEHEAD,
                                                          SEGMENTOR)
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import (P, _t, assert_feature_parity, randomize,
                                   tbn, tconv)

torch.set_grad_enabled(False)

HEAD = dict(type="OCRHead", in_channels=12, in_index=0, channels=8,
            ocr_channels=6, dropout_ratio=0.0, num_classes=3,
            align_corners=False,
            norm_cfg=dict(type="SyncBatchNorm", requires_grad=True),
            loss_decode=dict(type="CrossEntropyLoss"))


def t_convbnrelu(x, params, stats, prefix, k=1):
    x = tconv(x, P(params, prefix + "/conv/weight"), padding=k // 2)
    x = tbn(x, params, stats, prefix + "/bn")
    return TF.relu(x)


def t_ocr_head(params, stats, x_nchw, prev_logits_nchw, heads_scale=1.0):
    feats = t_convbnrelu(x_nchw, params, stats, "feat_bottleneck", k=3)
    N, C, H, W = feats.shape
    K = prev_logits_nchw.shape[1]
    # spatial gather: softmax over pixels per class
    probs = TF.softmax(heads_scale
                       * prev_logits_nchw.reshape(N, K, H * W), dim=2)
    ctx = torch.matmul(probs, feats.reshape(N, C, H * W).transpose(1, 2))
    ctx_img = ctx.transpose(1, 2)[..., None]           # (N, C, K, 1)

    ob = "object_context_block"
    q = t_convbnrelu(feats, params, stats, f"{ob}/query_project_0")
    q = t_convbnrelu(q, params, stats, f"{ob}/query_project_1")
    k = t_convbnrelu(ctx_img, params, stats, f"{ob}/key_project_0")
    k = t_convbnrelu(k, params, stats, f"{ob}/key_project_1")[..., 0]
    v = t_convbnrelu(ctx_img, params, stats, f"{ob}/value_project")[..., 0]

    ch = q.shape[1]
    sim = torch.einsum("nchw,nck->nhwk", q, k) * (ch ** -0.5)
    attn = TF.softmax(sim, dim=-1)
    out = torch.einsum("nhwk,nck->nchw", attn, v)
    out = t_convbnrelu(out, params, stats, f"{ob}/out_project")
    out = t_convbnrelu(torch.cat([out, feats], dim=1), params, stats,
                       f"{ob}/bottleneck")
    return tconv(out, P(params, "conv_seg/weight"),
                 bias=np.asarray(P(params, "conv_seg/bias")))


def _init_head(cfg=HEAD, hw=(9, 11)):
    head = build_module_from_cfg(cfg, DECODEHEAD)
    x = jnp.zeros((1, *hw, cfg["in_channels"]))
    prev = jnp.zeros((1, *hw, cfg["num_classes"]))
    v = head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, [x],
                  prev_logits=prev)
    return head, v


def test_ocr_head_matches_torch(rng):
    head, v = _init_head()
    v = randomize(v, seed=51)
    x = rng.randn(2, 9, 11, 12).astype(np.float32)
    prev = rng.randn(2, 9, 11, 3).astype(np.float32)
    jax_out = head.apply(v, [jnp.asarray(x)],
                         prev_logits=jnp.asarray(prev))
    t = t_ocr_head(v["params"], v["batch_stats"],
                   _t(x.transpose(0, 3, 1, 2)),
                   _t(prev.transpose(0, 3, 1, 2)))
    assert_feature_parity(jax_out, t, rtol=5e-3, atol=5e-4)


def test_ocr_head_requires_prev_logits():
    head, v = _init_head()
    with pytest.raises(AssertionError, match="prev"):
        head.apply(v, [jnp.zeros((1, 9, 11, 12))])


def test_ocr_cascade_chains_prev_logits(rng):
    """encode_decode == manual stage0 -> OCR chaining (the prev-logits
    path, no feature concat)."""
    cfg = dict(
        type="CascadeEncoderDecoder", num_stages=2,
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(3,), dilations=(1, 1, 1, 1),
                      strides=(1, 2, 2, 2),
                      norm_cfg=dict(type="BN", requires_grad=True)),
        decode_head=[
            dict(type="FCNHead", in_channels=512, in_index=0, channels=16,
                 num_convs=1, concat_input=False, dropout_ratio=0.0,
                 num_classes=3, align_corners=False,
                 norm_cfg=dict(type="BN", requires_grad=True),
                 loss_decode=dict(type="CrossEntropyLoss", loss_weight=0.4)),
            dict(type="OCRHead", in_channels=512, in_index=0, channels=16,
                 ocr_channels=8, dropout_ratio=0.0, num_classes=3,
                 align_corners=False,
                 norm_cfg=dict(type="BN", requires_grad=True),
                 loss_decode=dict(type="CrossEntropyLoss", loss_weight=1.0)),
        ],
        train_cfg=dict(), test_cfg=dict(mode="whole"))
    from image_segmentation_lab_tpu.models import build_segmentor
    m = build_segmentor(cfg)
    x0 = jnp.zeros((1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x0,
               jnp.zeros((1, 32, 32), jnp.int32), img_metas={},
               rescale=False, return_loss=True, train=True)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    full = m.apply(v, x, method="encode_decode")

    def manual(mdl, xx):
        f = mdl.extract_feat(xx)
        prev = mdl.stage_heads[0].forward_test(f)
        out = mdl.stage_heads[1](f, prev_logits=prev)
        from image_segmentation_lab_tpu.utils.ops import resize
        return resize(out, size=xx.shape[1:3], mode="bilinear",
                      align_corners=mdl.align_corners)

    ref = m.apply(v, x, method=manual)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # training produces a loss for both stages
    _, losses = m.apply(v, x, jnp.zeros((1, 32, 32), jnp.int32),
                        rescale=False, train=True,
                        rngs={"dropout": jax.random.PRNGKey(2)},
                        method="forward_train")
    assert any(k.startswith("decode_0") for k in losses)
    assert any(k.startswith("decode.") for k in losses)
