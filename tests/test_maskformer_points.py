"""Point-sampled mask losses (upstream Mask2Former arrangement):
BCE pair-cost golden, constant-field equivalence with the dense path,
importance sampling concentrating on the decision boundary, and the
tiny-config train step through the point path."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from image_segmentation_lab_tpu.models.decode_heads.maskformer_head import (
    MaskFormerHead, _bce_cost, _sample_rows)

torch.set_grad_enabled(False)


def t_bce_cost(mask_logits, gt):
    """mmdet CrossEntropyLossCost(binary_input=True) torch derivation."""
    n = mask_logits.shape[-1]
    pos = torch.nn.functional.binary_cross_entropy_with_logits(
        mask_logits, torch.ones_like(mask_logits), reduction="none")
    neg = torch.nn.functional.binary_cross_entropy_with_logits(
        mask_logits, torch.zeros_like(mask_logits), reduction="none")
    cost = torch.einsum("qp,tp->tq", pos, gt) + \
        torch.einsum("qp,tp->tq", neg, 1 - gt)
    return cost / n


def test_bce_cost_matches_torch(rng):
    mp = rng.randn(6, 50).astype(np.float32)
    gt = (rng.rand(3, 50) > 0.6).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(_bce_cost(jnp.asarray(mp), jnp.asarray(gt))),
        t_bce_cost(torch.from_numpy(mp), torch.from_numpy(gt)).numpy(),
        rtol=1e-5, atol=1e-6)


def test_sample_rows_matches_grid_sample(rng):
    """Per-row sampling == torch grid_sample(2*p-1, align_corners=False)
    on each row's own map."""
    maps = rng.randn(3, 6, 7).astype(np.float32)
    pts = rng.rand(3, 11, 2).astype(np.float32)
    got = _sample_rows(jnp.asarray(maps), jnp.asarray(pts))
    want = torch.nn.functional.grid_sample(
        torch.from_numpy(maps)[:, None],             # (3, 1, 6, 7)
        torch.from_numpy(2 * pts - 1)[:, None],      # (3, 1, 11, 2)
        mode="bilinear", padding_mode="zeros",
        align_corners=False)[:, 0, 0]
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-5, atol=1e-6)


def _bare_head(K, Q, **over):
    head = MaskFormerHead.__new__(MaskFormerHead)
    cfg = dict(num_classes=K, num_queries=Q, cls_weight=1.0,
               mask_weight=20.0, dice_weight=1.0, no_object_weight=0.1,
               focal_alpha=0.25, focal_gamma=2.0, mask_loss_type="focal",
               num_points=0, oversample_ratio=3.0,
               importance_sample_ratio=0.75)
    cfg.update(over)
    for k, v in cfg.items():
        object.__setattr__(head, k, v)
    return head


def _gsample(maps, pts):
    """torch grid_sample twin of _sample_rows."""
    t = torch.nn.functional.grid_sample(
        torch.from_numpy(np.asarray(maps, np.float32))[:, None],
        torch.from_numpy(np.asarray(2 * pts - 1, np.float32))[:, None],
        mode="bilinear", padding_mode="zeros", align_corners=False)
    return t[:, 0, 0]


def test_point_layer_loss_matches_torch_scipy_rederivation(rng):
    """Full point-path golden: the jax _layer_loss (DENSE matching
    costs at mask resolution against soft-downsampled gt → auction
    matching → importance-sampled loss points → bce+dice losses)
    against an independent torch + scipy re-derivation that shares
    ONLY the rng draws.  gt rides a different (full) resolution than
    the mask logits."""
    from scipy.optimize import linear_sum_assignment

    from test_maskformer import t_dice_cost

    K, Q, h, w, H, W = 2, 4, 6, 9, 12, 18
    Pn = 8
    head = _bare_head(K, Q, mask_loss_type="ce", num_points=Pn,
                      cls_weight=2.0, mask_weight=5.0, dice_weight=5.0)
    cls_scores = rng.randn(Q, K + 1).astype(np.float32)
    masks = rng.randn(Q, h, w).astype(np.float32)
    gt = (rng.rand(K, H, W) > 0.5).astype(np.float32)
    # soft (area-mean) targets at mask resolution — the head's
    # forward_train computes these with the framework resize; the twin
    # below re-derives them with torch interpolate
    from image_segmentation_lab_tpu.utils.ops import resize
    gt_match = jnp.transpose(
        resize(jnp.transpose(jnp.asarray(gt), (1, 2, 0))[None],
               size=(h, w), mode="bilinear", align_corners=False)[0],
        (2, 0, 1))
    key = jax.random.PRNGKey(5)
    lc, lm, ld = MaskFormerHead._layer_loss(
        head, jnp.asarray(cls_scores), jnp.asarray(masks), jnp.asarray(gt),
        jnp.asarray([True, True]), key=key, gt_match=gt_match)

    # --- torch/scipy twin, reusing only the key-split/uniform draws
    k_os, k_rand = jax.random.split(key, 2)
    mp_t = torch.from_numpy(masks).reshape(Q, -1)           # (Q, h*w)
    gm_t = torch.nn.functional.interpolate(
        torch.from_numpy(gt)[None], size=(h, w), mode="bilinear",
        align_corners=False)[0].reshape(K, -1)              # (K, h*w)
    probs = torch.softmax(torch.from_numpy(cls_scores), -1)
    cost = (2.0 * (-probs[:, :K].T)
            + 5.0 * t_bce_cost(mp_t, gm_t)
            + 5.0 * t_dice_cost(mp_t, gm_t)).numpy()
    ri, ci = linear_sum_assignment(cost)
    col = ci[np.argsort(ri)]                                 # (K,)

    labels = np.full((Q,), K, np.int64)
    labels[col] = np.arange(K)
    logp = torch.log_softmax(torch.from_numpy(cls_scores), -1).numpy()
    cw = np.asarray([1.0, 1.0, 0.1], np.float32)[labels]
    ce = -logp[np.arange(Q), labels] * cw
    want_cls = 2.0 * ce.sum() / cw.sum()
    np.testing.assert_allclose(float(lc), want_cls, rtol=2e-5, atol=1e-6)

    n_os, n_imp = int(Pn * 3.0), int(Pn * 0.75)
    os_pts = np.asarray(jax.random.uniform(k_os, (K, n_os, 2),
                                           jnp.float32))
    sel_maps = masks[col]
    unc = -np.abs(_gsample(sel_maps, os_pts).numpy())
    top = np.argsort(-unc, axis=1)[:, :n_imp]
    imp_pts = np.take_along_axis(os_pts, top[..., None], axis=1)
    rand_pts = np.asarray(jax.random.uniform(k_rand, (K, Pn - n_imp, 2),
                                             jnp.float32))
    pts_l = np.concatenate([imp_pts, rand_pts], axis=1)      # (K, Pn, 2)
    sel = _gsample(sel_maps, pts_l)                          # (K, Pn)
    g = _gsample(gt, pts_l)
    p = torch.sigmoid(sel)
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        sel, g, reduction="none")
    want_mask = 5.0 * float(bce.mean(-1).sum() / K)
    inter = 2 * (p * g).sum(-1)
    dice = 1 - (inter + 1e-3) / (p.sum(-1) + g.sum(-1) + 1e-3)
    want_dice = 5.0 * float(dice.sum() / K)
    np.testing.assert_allclose(float(lm), want_mask, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(ld), want_dice, rtol=2e-5, atol=1e-6)


def test_importance_sampling_concentrates_on_boundary():
    """With a prediction that is certain (|logit|=8) on the left half
    and uncertain (|logit|≈0) on the right, at least the importance
    fraction of loss points must land in the uncertain half."""
    K, Q, h, w = 1, 2, 8, 16
    head = _bare_head(K, Q, num_points=16, oversample_ratio=4.0,
                      importance_sample_ratio=0.75)
    masks = np.full((Q, h, w), 8.0, np.float32)
    masks[:, :, w // 2:] = 0.05                      # uncertain right half
    gt = (np.arange(w)[None, None, :] >= w // 2) * np.ones(
        (K, h, 1))                                    # class on the right
    cls_scores = np.zeros((Q, K + 1), np.float32)
    cls_scores[0, 0] = 6.0

    # reproduce the head's sampling to inspect the chosen coords
    key = jax.random.PRNGKey(11)
    k_os, k_rand = jax.random.split(key, 2)
    Pn, n_os = 16, int(16 * 4.0)
    n_imp = int(16 * 0.75)
    sel_maps = jnp.asarray(masks[:K])                # matched query 0
    os_pts = jax.random.uniform(k_os, (K, n_os, 2), jnp.float32)
    unc = -jnp.abs(_sample_rows(sel_maps, os_pts))
    _, top = jax.lax.top_k(unc, n_imp)
    imp_pts = jnp.take_along_axis(os_pts, top[..., None], axis=1)
    xs = np.asarray(imp_pts[0, :, 0])
    assert (xs > 0.5).mean() > 0.9, xs               # boundary-seeking

    # and the full loss through the head stays finite with gradients
    def f(m):
        lc, lm, ld = MaskFormerHead._layer_loss(
            head, jnp.asarray(cls_scores), m, jnp.asarray(gt, jnp.float32),
            jnp.asarray([True]), key=key,
            gt_match=jnp.asarray(gt, jnp.float32))
        return lc + lm + ld
    g = jax.grad(f)(jnp.asarray(masks))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_mask2former_tiny_trains_through_point_path(rng):
    """The shipped-config arrangement (num_points, bce, upstream
    weights) runs a train step end-to-end with finite losses and
    differs run-to-run only via the rng (sanity that points are live)."""
    from image_segmentation_lab_tpu.core.builder import build_optimizer
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                        make_train_step)
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), strides=(1, 2, 2, 2),
                      dilations=(1, 1, 1, 1), stem_channels=8,
                      base_channels=8,
                      norm_cfg=dict(type="BN", requires_grad=True)),
        decode_head=dict(type="Mask2FormerHead",
                         in_channels=[8, 16, 32, 64],
                         in_index=(0, 1, 2, 3),
                         input_transform="multiple_select",
                         channels=16, feat_channels=16, num_queries=5,
                         num_decoder_layers=3, num_heads=2, num_scales=3,
                         feedforward_channels=32,
                         cls_weight=2.0, mask_weight=5.0, dice_weight=5.0,
                         mask_loss_type="ce", num_points=64,
                         dropout_ratio=0.0, num_classes=3),
        test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 3, size=(2, 32, 32)).astype(np.int32))
    tx = build_optimizer(dict(type="AdamW", lr=1e-3))
    state = create_train_state(model, jax.random.PRNGKey(0), img, gt, tx)
    step = make_train_step(model, tx, donate=False)
    _, lv1 = step(state, img, gt, jax.random.PRNGKey(1))
    _, lv2 = step(state, img, gt, jax.random.PRNGKey(2))
    for k in ("decode.loss_cls", "decode.loss_mask", "decode.loss_dice",
              "decode.d0.loss_mask"):
        assert np.isfinite(float(lv1[k])), (k, sorted(lv1))
    # different rng → different sampled points → different mask loss
    assert abs(float(lv1["decode.loss_mask"])
               - float(lv2["decode.loss_mask"])) > 1e-7
