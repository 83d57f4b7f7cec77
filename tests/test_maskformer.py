"""MaskFormer (beyond-reference): on-device auction matching vs scipy,
torch-golden matching costs and positional encoding, semantic
combination semantics, full train/eval + config."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from scipy.optimize import linear_sum_assignment

from image_segmentation_lab_tpu.models.decode_heads.maskformer_head import (
    _dice_cost, _focal_cost, sine_positional_encoding)
from image_segmentation_lab_tpu.ops.matching import auction_assignment

torch.set_grad_enabled(False)


# ------------------------------------------------------------- matching

def test_auction_matches_scipy_optimum(rng):
    for t in range(30):
        T = rng.randint(2, 9)
        Q = rng.randint(T, 40)
        cost = rng.randn(T, Q).astype(np.float32)
        col, owner = jax.jit(auction_assignment)(jnp.asarray(cost))
        col = np.asarray(col)
        assert len(set(col.tolist())) == T, "columns must be distinct"
        ri, ci = linear_sum_assignment(cost)
        got, want = cost[np.arange(T), col].sum(), cost[ri, ci].sum()
        # eps-optimality bound; in practice exact on generic floats
        assert got <= want + T * 1e-3
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_auction_respects_valid_rows(rng):
    cost = rng.randn(4, 10).astype(np.float32)
    valid = jnp.asarray([True, False, True, False])
    col, owner = auction_assignment(jnp.asarray(cost), valid_rows=valid)
    col = np.asarray(col)
    assert col[1] == -1 and col[3] == -1
    assert col[0] >= 0 and col[2] >= 0 and col[0] != col[2]
    # the valid 2-row subproblem is solved optimally
    ri, ci = linear_sum_assignment(cost[[0, 2]])
    np.testing.assert_allclose(cost[[0, 2]][ri, ci].sum(),
                               cost[0, col[0]] + cost[2, col[2]],
                               atol=1e-4)


def test_auction_edge_cases(rng):
    # all rows invalid: immediate termination, everything unassigned
    col, owner = auction_assignment(jnp.ones((3, 5)),
                                    valid_rows=jnp.zeros(3, bool))
    assert (np.asarray(col) == -1).all() and (np.asarray(owner) == -1).all()
    # square T == Q stays optimal
    c = rng.randn(6, 6).astype(np.float32)
    col, _ = auction_assignment(jnp.asarray(c))
    ri, ci = linear_sum_assignment(c)
    np.testing.assert_allclose(c[np.arange(6), np.asarray(col)].sum(),
                               c[ri, ci].sum(), atol=1e-4)
    # maximal ties still yield a permutation (eps breaks the deadlock)
    col, _ = auction_assignment(jnp.zeros((4, 4)))
    assert sorted(np.asarray(col).tolist()) == [0, 1, 2, 3]
    # vmap over a batch of cost matrices (how the head uses it)
    cb = rng.randn(5, 3, 8).astype(np.float32)
    cols = jax.vmap(lambda c: auction_assignment(c)[0])(jnp.asarray(cb))
    assert cols.shape == (5, 3)


# ------------------------------------------------------- cost goldens

def t_focal_cost(mask_logits, gt, alpha=0.25, gamma=2.0, eps=1e-12):
    """mmdet FocalLossCost(binary_input=True) torch derivation."""
    p = torch.sigmoid(mask_logits)
    pos = -(p + eps).log() * alpha * (1 - p).pow(gamma)
    neg = -(1 - p + eps).log() * (1 - alpha) * p.pow(gamma)
    cost = torch.einsum("qp,tp->tq", pos, gt) + \
        torch.einsum("qp,tp->tq", neg, 1 - gt)
    return cost / mask_logits.shape[-1]


def t_dice_cost(mask_logits, gt, eps=1e-3):
    p = torch.sigmoid(mask_logits)
    inter = 2 * torch.einsum("qp,tp->tq", p, gt)
    denom = p.sum(-1)[None, :] + gt.sum(-1)[:, None]
    return 1 - (inter + eps) / (denom + eps)


def test_matching_costs_match_torch(rng):
    mp = rng.randn(6, 50).astype(np.float32)
    gt = (rng.rand(3, 50) > 0.6).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(_focal_cost(jnp.asarray(mp), jnp.asarray(gt))),
        t_focal_cost(torch.from_numpy(mp), torch.from_numpy(gt)).numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(_dice_cost(jnp.asarray(mp), jnp.asarray(gt))),
        t_dice_cost(torch.from_numpy(mp), torch.from_numpy(gt)).numpy(),
        rtol=1e-5, atol=1e-6)


def test_sine_positional_encoding_matches_torch():
    """mmdet SinePositionalEncoding(normalize=True) torch derivation."""
    H, W, F = 5, 7, 8
    got = np.asarray(sine_positional_encoding(H, W, F))
    mask_not = torch.ones(1, H, W)
    y = mask_not.cumsum(1)
    x = mask_not.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = torch.arange(F, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / F)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()),
                        dim=4).view(1, H, W, -1)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()),
                        dim=4).view(1, H, W, -1)
    want = torch.cat((pos_y, pos_x), dim=3)[0].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pixel_decoder_matches_torch(rng):
    """FPN top-down pixel decoder: GN laterals + output convs + final
    3x3 mask-feature conv, torch twin."""
    import torch.nn.functional as TF
    from test_zoo_torch_parity import P, _t, randomize, tconv, \
        assert_feature_parity
    from image_segmentation_lab_tpu.models.decode_heads.maskformer_head \
        import PixelDecoder

    def tgn(x, p, path, groups):
        w = torch.from_numpy(np.asarray(P(p, path + "/weight")))
        b = torch.from_numpy(np.asarray(P(p, path + "/bias")))
        return TF.group_norm(x, groups, w, b, eps=1e-5)

    G = 4
    m = PixelDecoder((8, 16, 24), 8, 12,
                     norm_cfg=dict(type="GN", num_groups=G))
    xs = [rng.randn(1, 16, 16, 8).astype(np.float32),
          rng.randn(1, 8, 8, 16).astype(np.float32),
          rng.randn(1, 4, 4, 24).astype(np.float32)]
    jxs = [jnp.asarray(x) for x in xs]
    variables = m.init(jax.random.PRNGKey(0), jxs)
    variables = randomize(variables, seed=243)
    mask_feat, memory = m.apply(variables, jxs, mutable=False)
    p = variables["params"]
    txs = [_t(x.transpose(0, 3, 1, 2)) for x in xs]
    y = TF.relu(tgn(tconv(txs[-1], P(p, "last_feat_conv/conv/weight"),
                          padding=1), p, "last_feat_conv/gn", G))
    for i in (1, 0):
        lat = tgn(tconv(txs[i], P(p, f"lateral{i}/conv/weight")),
                  p, f"lateral{i}/gn", G)
        y = lat + TF.interpolate(y, size=lat.shape[2:], mode="bilinear",
                                 align_corners=False)
        y = TF.relu(tgn(tconv(y, P(p, f"output{i}/conv/weight"),
                              padding=1), p, f"output{i}/gn", G))
    want = tconv(y, P(p, "mask_feature/weight"), padding=1,
                 bias=np.asarray(P(p, "mask_feature/bias")))
    assert_feature_parity(mask_feat, want)
    np.testing.assert_array_equal(np.asarray(memory), xs[-1])


# --------------------------------------------------------------- network

def _tiny_cfg(num_classes=3):
    norm = dict(type="BN")
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 1, 1),
                      strides=(1, 2, 2, 2), norm_cfg=norm,
                      base_channels=8, stem_channels=8),
        decode_head=dict(type="MaskFormerHead",
                         in_channels=[8, 16, 32, 64],
                         in_index=(0, 1, 2, 3),
                         input_transform="multiple_select",
                         channels=16, feat_channels=16, num_queries=8,
                         num_decoder_layers=2, num_heads=2,
                         feedforward_channels=32, dropout_ratio=0.0,
                         num_classes=num_classes),
        test_cfg=dict(mode="whole"))


def test_maskformer_trains_and_infers(rng):
    from image_segmentation_lab_tpu.core.builder import build_optimizer
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                        make_train_step)
    model = build_segmentor(_tiny_cfg())
    img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 3, size=(2, 32, 32)).astype(np.int32))
    tx = build_optimizer(dict(type="AdamW", lr=1e-3))
    state = create_train_state(model, jax.random.PRNGKey(0), img, gt, tx)
    step = make_train_step(model, tx)
    state, log_vars = step(state, img, gt, jax.random.PRNGKey(1))
    for key in ("decode.loss_cls", "decode.loss_mask", "decode.loss_dice",
                "decode.d0.loss_cls"):
        assert np.isfinite(float(log_vars[key])), (key, log_vars)
    probs = model.apply(state.variables(), img[:1], method="inference")
    assert probs.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)),
                               np.ones((1, 32, 32)), atol=1e-3)


def test_maskformer_semantic_combination(rng):
    """With hand-set query outputs the semantic argmax is the query
    einsum: query q owns class q and a disjoint spatial stripe."""
    from image_segmentation_lab_tpu.models.decode_heads.maskformer_head \
        import MaskFormerHead
    head = MaskFormerHead.__new__(MaskFormerHead)  # only the combiner
    K = 3
    cls_scores = np.full((1, 3, K + 1), -8.0, np.float32)
    for q in range(3):
        cls_scores[0, q, q] = 8.0
    masks = np.full((1, 3, 4, 6), -8.0, np.float32)
    masks[0, 0, :, :2] = 8.0
    masks[0, 1, :, 2:4] = 8.0
    masks[0, 2, :, 4:] = 8.0
    object.__setattr__(head, "num_classes", K)
    sem = MaskFormerHead._semantic_logits(head, jnp.asarray(cls_scores),
                                          jnp.asarray(masks))
    pred = np.asarray(jnp.argmax(sem, -1))[0]
    assert (pred[:, :2] == 0).all()
    assert (pred[:, 2:4] == 1).all()
    assert (pred[:, 4:] == 2).all()


def _bare_head(K, Q):
    from image_segmentation_lab_tpu.models.decode_heads.maskformer_head \
        import MaskFormerHead
    head = MaskFormerHead.__new__(MaskFormerHead)
    for k, v in dict(num_classes=K, num_queries=Q, cls_weight=1.0,
                     mask_weight=20.0, dice_weight=1.0,
                     no_object_weight=0.1, focal_alpha=0.25,
                     focal_gamma=2.0).items():
        object.__setattr__(head, k, v)
    return head


def test_maskformer_loss_prefers_correct_assignment(rng):
    """Queries that already predict the class masks get matched:
    perturbing only the unmatched queries' masks leaves the matched
    mask/dice losses unchanged (cls loss too — it reads logits, and the
    unmatched queries stay unmatched because their cost is worse)."""
    from image_segmentation_lab_tpu.models.decode_heads.maskformer_head \
        import MaskFormerHead
    K, Q, h, w = 2, 4, 4, 6
    head = _bare_head(K, Q)
    gt = np.zeros((K, h, w), np.float32)
    gt[0, :, :3] = 1
    gt[1, :, 3:] = 1
    cls_scores = np.full((Q, K + 1), -6.0, np.float32)
    cls_scores[3, 0] = 6.0   # query 3 claims class 0
    cls_scores[1, 1] = 6.0   # query 1 claims class 1
    masks = rng.randn(Q, h, w).astype(np.float32)
    masks[3] = np.where(gt[0] > 0, 9.0, -9.0)
    masks[1] = np.where(gt[1] > 0, 9.0, -9.0)
    valid = jnp.asarray([True, True])
    args = (jnp.asarray(cls_scores), jnp.asarray(masks), jnp.asarray(gt),
            valid)
    lc1, lm1, ld1 = MaskFormerHead._layer_loss(head, *args)
    masks2 = masks.copy()
    masks2[0] = -masks2[0] * 3   # unmatched queries perturbed
    masks2[2] = masks2[2] + 5
    args2 = (jnp.asarray(cls_scores), jnp.asarray(masks2), jnp.asarray(gt),
             valid)
    lc2, lm2, ld2 = MaskFormerHead._layer_loss(head, *args2)
    np.testing.assert_allclose(float(lm1), float(lm2), atol=1e-6)
    np.testing.assert_allclose(float(ld1), float(ld2), atol=1e-6)
    np.testing.assert_allclose(float(lc1), float(lc2), atol=1e-6)
    # and the matched pairs are near-perfect: dice loss ~ 0
    assert float(ld1) < 0.05


def test_instance_results_api(rng):
    """Static-shape per-query mask-classification results through the
    head (the segmentor API stays semantic)."""
    from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
    from image_segmentation_lab_tpu.models.builder import \
        build_module_from_cfg
    h = build_module_from_cfg(_tiny_cfg()["decode_head"], DECODEHEAD)
    feats = [jnp.asarray(rng.randn(2, 32 // s, 32 // s, c).astype(np.float32))
             for s, c in zip((4, 8, 16, 32), (8, 16, 32, 64))]
    hv = h.init(jax.random.PRNGKey(0), feats)
    labels, scores, masks = h.apply(hv, feats, method="instance_results",
                                    mutable=False)
    assert labels.shape == (2, 8) and scores.shape == (2, 8)
    assert masks.shape[:2] == (2, 8) and masks.dtype == bool
    assert int(np.asarray(labels).max()) < 3 and float(scores.min()) >= 0.0


def test_panoptic_map_postprocessing(rng):
    """Hand-set query outputs exercise the three panoptic rules:
    confidence gate, per-pixel competition, overlap filter."""
    from image_segmentation_lab_tpu.models.decode_heads.maskformer_head \
        import MaskFormerHead
    K, Q, h, w = 3, 4, 4, 8
    head = _bare_head(K, Q)

    cls_scores = np.full((1, Q, K + 1), -8.0, np.float32)
    cls_scores[0, 0, 0] = 8.0    # confident, owns left half
    cls_scores[0, 1, 1] = 8.0    # confident, owns right half
    cls_scores[0, 2, 2] = 0.1    # NOT confident (score gate drops it)
    cls_scores[0, 3, 2] = 8.0    # confident but fully overlapped by q0/q1
    masks = np.full((1, Q, h, w), -9.0, np.float32)
    masks[0, 0, :, :4] = 9.0
    masks[0, 1, :, 4:] = 9.0
    masks[0, 2] = 9.0
    masks[0, 3] = 4.0            # high, but q0/q1 win every pixel

    object.__setattr__(head, "_forward_all",
                       lambda inputs, train: ([jnp.asarray(cls_scores)],
                                              [jnp.asarray(masks)]))
    qid, labels, keep = MaskFormerHead.panoptic_map(head, None)
    qid = np.asarray(qid)[0]
    keep = np.asarray(keep)[0]
    assert keep[0] and keep[1]
    assert not keep[2], "low-confidence query must be gated"
    assert not keep[3], "fully-overlapped query must fail the overlap test"
    assert (qid[:, :4] == 0).all() and (qid[:, 4:] == 1).all()
    assert np.asarray(labels)[0, 0] == 0 and np.asarray(labels)[0, 1] == 1


def test_maskformer_config_builds():
    from image_segmentation_lab_tpu.core.fileio.parse import \
        parse_and_backup_config
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    cfg = parse_and_backup_config(
        "configs/network/maskformer/maskformer_r50.py")
    model = cfg["model"]
    model["backbone"].update(depth=18, base_channels=8, stem_channels=8)
    model["decode_head"].update(in_channels=[8, 16, 32, 64], channels=16,
                                feat_channels=16, num_queries=8,
                                num_decoder_layers=2, num_heads=2,
                                feedforward_channels=32)
    seg = build_segmentor(model)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = seg.init(jax.random.PRNGKey(0), x, method="encode_decode")
    out = seg.apply(variables, x, method="encode_decode", mutable=False)
    assert out.shape == (1, 64, 64, 2)
