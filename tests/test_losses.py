"""Golden-parity tests of losses against torch formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.models.losses import (CrossEntropyLoss,
                                                      DiceLoss, LovaszLoss,
                                                      TverskyLoss, accuracy)


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


def test_softmax_ce_matches_torch(rng):
    pred = _rand(rng, 2, 8, 8, 4)
    label = rng.randint(0, 4, (2, 8, 8))
    label[0, :2] = 255  # ignored region
    loss_fn = CrossEntropyLoss(use_sigmoid=False)
    out = loss_fn(jnp.asarray(pred), jnp.asarray(label), ignore_index=255)
    ref = TF.cross_entropy(torch.tensor(np.transpose(pred, (0, 3, 1, 2))),
                           torch.tensor(label).long(), reduction="none",
                           ignore_index=255).mean()
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_softmax_ce_avg_non_ignore(rng):
    pred = _rand(rng, 2, 8, 8, 4)
    label = rng.randint(0, 4, (2, 8, 8))
    label[:, :4] = 255
    loss_fn = CrossEntropyLoss(use_sigmoid=False, avg_non_ignore=True)
    out = loss_fn(jnp.asarray(pred), jnp.asarray(label), ignore_index=255)
    ref = TF.cross_entropy(torch.tensor(np.transpose(pred, (0, 3, 1, 2))),
                           torch.tensor(label).long(), reduction="mean",
                           ignore_index=255)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-4)


def test_binary_ce_one_channel(rng):
    pred = _rand(rng, 2, 8, 8, 1)
    label = rng.randint(0, 2, (2, 8, 8))
    loss_fn = CrossEntropyLoss(use_sigmoid=True)
    out = loss_fn(jnp.asarray(pred), jnp.asarray(label), ignore_index=255)
    ref = TF.binary_cross_entropy_with_logits(
        torch.tensor(pred[..., 0]), torch.tensor(label).float(),
        reduction="none").mean()
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_binary_ce_multichannel_onehot(rng):
    """use_sigmoid with C>1 → one-hot expansion + valid-mask weighting."""
    pred = _rand(rng, 2, 4, 4, 3)
    label = rng.randint(0, 3, (2, 4, 4))
    label[0, 0, 0] = 255
    loss_fn = CrossEntropyLoss(use_sigmoid=True)
    out = loss_fn(jnp.asarray(pred), jnp.asarray(label), ignore_index=255)

    tlabel = torch.tensor(label).long()
    valid = (tlabel >= 0) & (tlabel != 255)
    onehot = torch.zeros(2, 4, 4, 3)
    onehot[valid] = TF.one_hot(tlabel[valid], 3).float()
    raw = TF.binary_cross_entropy_with_logits(
        torch.tensor(pred), onehot, reduction="none")
    ref = (raw * valid.unsqueeze(-1)).mean()
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_dice_loss_formula(rng):
    pred = _rand(rng, 2, 6, 6, 3)
    label = rng.randint(0, 3, (2, 6, 6))
    loss_fn = DiceLoss(ignore_index=255)
    out = float(loss_fn(jnp.asarray(pred), jnp.asarray(label)))

    probs = TF.softmax(torch.tensor(pred), dim=-1).numpy()
    onehot = np.eye(3)[label]
    total = 0.0
    for n in range(2):
        per_img = 0.0
        for c in range(3):
            p, t = probs[n, ..., c].ravel(), onehot[n, ..., c].ravel()
            num = 2 * (p * t).sum() + 1
            den = (p ** 2).sum() + (t ** 2).sum() + 1
            per_img += 1 - num / den
        total += per_img / 3
    np.testing.assert_allclose(out, total / 2, rtol=1e-5)


def test_tversky_formula(rng):
    pred = _rand(rng, 2, 5, 5, 2)
    label = rng.randint(0, 2, (2, 5, 5))
    alpha, beta, smooth = 0.3, 0.7, 1.0
    tv = TverskyLoss(alpha=alpha, beta=beta, smooth=smooth, ignore_index=255)
    out = float(tv(jnp.asarray(pred), jnp.asarray(label)))

    probs = TF.softmax(torch.tensor(pred), dim=-1).numpy()
    onehot = np.eye(2)[label]
    total = 0.0
    for n in range(2):
        per_img = 0.0
        for c in range(2):
            p, t = probs[n, ..., c].ravel(), onehot[n, ..., c].ravel()
            TP = (p * t).sum()
            FP = (p * (1 - t)).sum()
            FN = ((1 - p) * t).sum()
            per_img += 1 - (TP + smooth) / (TP + alpha * FP + beta * FN + smooth)
        total += per_img / 2
    np.testing.assert_allclose(out, total / 2, rtol=1e-5)


def test_lovasz_softmax_known_case():
    """Perfect prediction → ~0 loss; inverted prediction → ~1 per class."""
    loss_fn = LovaszLoss(per_image=False, reduction="none")
    label = jnp.zeros((1, 2, 2), jnp.int32)  # all class 0
    confident_c0 = jnp.broadcast_to(jnp.asarray([9.0, -9.0]), (1, 2, 2, 2))
    confident_c1 = jnp.broadcast_to(jnp.asarray([-9.0, 9.0]), (1, 2, 2, 2))
    assert float(loss_fn(confident_c0, label)) < 1e-3
    assert float(loss_fn(confident_c1, label)) > 0.9


def test_lovasz_ignore_matches_explicit_filtering(rng):
    """Masked-sort ignore handling == physically removing ignored pixels."""
    pred = _rand(rng, 1, 6, 6, 3)
    label = rng.randint(0, 3, (1, 6, 6))
    label[0, :2] = 255
    loss_fn = LovaszLoss(per_image=False, reduction="none")
    out = float(loss_fn(jnp.asarray(pred), jnp.asarray(label),
                        ignore_index=255))
    # explicit filtering reference
    probs = TF.softmax(torch.tensor(pred.reshape(-1, 3)), dim=-1).numpy()
    flat_label = label.reshape(-1)
    keep = flat_label != 255
    p, l = probs[keep], flat_label[keep]
    losses, present = [], 0
    for c in range(3):
        fg = (l == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        present += 1
        errors = np.abs(fg - p[:, c])
        order = np.argsort(-errors)
        e, f = errors[order], fg[order]
        gts = f.sum()
        inter = gts - np.cumsum(f)
        union = gts + np.cumsum(1 - f)
        jac = 1 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append((np.maximum(e, 0) * jac).sum())
    ref = sum(losses) / present
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_accuracy_matches_manual(rng):
    pred = _rand(rng, 2, 4, 4, 3)
    label = rng.randint(0, 3, (2, 4, 4))
    label[0, 0] = 255
    out = float(accuracy(jnp.asarray(pred), jnp.asarray(label),
                         ignore_index=255))
    am = pred.argmax(-1)
    valid = label != 255
    ref = (am[valid] == label[valid]).mean() * 100
    np.testing.assert_allclose(out, ref, rtol=1e-3)


def test_dice_loss_ignores_pixel_weight(rng):
    """OHEM sampler weights must not crash DiceLoss (mmseg swallows them)."""
    pred = _rand(rng, 2, 8, 8, 3)
    label = rng.randint(0, 3, (2, 8, 8))
    w = rng.rand(2, 8, 8).astype(np.float32)
    loss_fn = DiceLoss()
    a = float(loss_fn(jnp.asarray(pred), jnp.asarray(label)))
    b = float(loss_fn(jnp.asarray(pred), jnp.asarray(label),
                      weight=jnp.asarray(w)))
    np.testing.assert_allclose(a, b)


def test_focal_loss_matches_torch(rng):
    """Torch twin of the mmseg sigmoid focal formula: BCE-with-logits x
    alpha-balanced (1-p_t)^gamma, one-hot targets, mean reduction."""
    from image_segmentation_lab_tpu.models.losses import FocalLoss
    pred = _rand(rng, 2, 6, 5, 3)
    label = rng.randint(0, 3, (2, 6, 5))
    gamma, alpha = 2.0, 0.25
    out = float(FocalLoss(gamma=gamma, alpha=alpha)(
        jnp.asarray(pred), jnp.asarray(label)))

    x = torch.tensor(pred.reshape(-1, 3))
    t = TF.one_hot(torch.tensor(label.reshape(-1)).long(), 3).float()
    p = torch.sigmoid(x)
    pt = (1 - p) * t + p * (1 - t)
    fw = (alpha * t + (1 - alpha) * (1 - t)) * pt.pow(gamma)
    ref = (TF.binary_cross_entropy_with_logits(x, t, reduction="none")
           * fw).mean()
    np.testing.assert_allclose(out, float(ref), rtol=1e-5)


def test_focal_loss_ignore_index_and_class_weight(rng):
    from image_segmentation_lab_tpu.models.losses import FocalLoss
    pred = _rand(rng, 1, 4, 4, 2)
    label = rng.randint(0, 2, (1, 4, 4))
    label[0, 0, :2] = 255
    cw = [0.3, 0.7]
    out = float(FocalLoss(class_weight=cw)(
        jnp.asarray(pred), jnp.asarray(label), ignore_index=255))

    x = torch.tensor(pred.reshape(-1, 2))
    lab = torch.tensor(label.reshape(-1)).long()
    valid = (lab != 255).float()[:, None]
    t = TF.one_hot(lab.clamp(0, 1), 2).float()
    p = torch.sigmoid(x)
    pt = (1 - p) * t + p * (1 - t)
    fw = (0.5 * t + 0.5 * (1 - t)) * pt.pow(2.0)
    loss = TF.binary_cross_entropy_with_logits(x, t, reduction="none") * fw
    w = torch.tensor(cw)[None, :] * valid
    ref = (loss * w).mean()  # mean over all N*C elements
    np.testing.assert_allclose(out, float(ref), rtol=1e-5)


def test_focal_loss_reduction_and_loss_name():
    from image_segmentation_lab_tpu.models.losses import FocalLoss
    fl = FocalLoss(reduction="sum", loss_weight=2.0, loss_name="loss_f")
    assert fl.loss_name == "loss_f"
    pred = jnp.zeros((1, 2, 2, 2))
    label = jnp.zeros((1, 2, 2), jnp.int32)
    v = float(fl(pred, label))
    # logits 0: bce = log(2); pt = 0.5 -> fw = 0.5 * 0.25; 8 elements
    np.testing.assert_allclose(
        v, 2.0 * 8 * np.log(2) * 0.5 * 0.25, rtol=1e-5)
    with pytest.raises(AssertionError):
        FocalLoss(use_sigmoid=False)


# ---------------------------------------------------------------------------
# KLDivLoss (temperature-scaled distillation KL, mmseg semantics)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("temperature,reduction", [
    (1.0, "mean"), (4.0, "mean"), (2.0, "sum"), (1.0, "none"),
])
def test_kldiv_loss_matches_torch(rng, temperature, reduction):
    from image_segmentation_lab_tpu.models.losses import KLDivLoss
    pred = _rand(rng, 2, 4, 4, 3)
    tgt = _rand(rng, 2, 4, 4, 3)
    out = KLDivLoss(temperature=temperature, reduction=reduction)(
        jnp.asarray(pred), jnp.asarray(tgt))
    tp = torch.tensor(pred) / temperature
    tt = torch.tensor(tgt) / temperature
    ref = TF.kl_div(TF.log_softmax(tp, dim=-1), TF.softmax(tt, dim=-1),
                    reduction="none") * temperature ** 2
    if reduction == "none":
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   rtol=1e-5, atol=1e-6)
    else:
        flat = ref.reshape(2, -1)
        red = flat.mean(1) if reduction == "mean" else flat.sum(1)
        np.testing.assert_allclose(np.asarray(out), red.numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_kldiv_loss_weight_and_name():
    from image_segmentation_lab_tpu.models.losses import KLDivLoss
    kl = KLDivLoss(loss_weight=3.0, loss_name="loss_distill")
    assert kl.loss_name == "loss_distill"
    x = jnp.zeros((1, 2, 2, 4))
    # identical logits -> zero divergence regardless of weight
    np.testing.assert_allclose(np.asarray(kl(x, x)), 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# SiLogLoss (scale-invariant log loss, mmseg depth semantics)
# ---------------------------------------------------------------------------


def test_silog_loss_matches_torch_derivation(rng):
    from image_segmentation_lab_tpu.models.losses import SiLogLoss
    pred = np.abs(_rand(rng, 2, 6, 6)) + 0.1
    tgt = np.abs(_rand(rng, 2, 6, 6)) + 0.1
    tgt[0, :2] = 0.0  # invalid depth pixels get masked
    out = SiLogLoss()(jnp.asarray(pred), jnp.asarray(tgt))

    eps, lambd = 1e-4, 0.5
    p, t = torch.tensor(pred).reshape(2, -1), torch.tensor(tgt).reshape(2, -1)
    valid = (t > eps) & (p > eps)
    d = torch.where(valid, t.clamp(min=eps).log() - p.clamp(min=eps).log(),
                    torch.zeros(()))
    cnt = valid.float().sum(1).clamp(min=1.0)
    m2 = (d * d).sum(1) / cnt
    m1 = d.sum(1) / cnt
    ref = torch.sqrt(m2 - lambd * m1 ** 2 + eps).mean()
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_silog_loss_scale_invariance(rng):
    """lambd=1 makes the loss exactly invariant to a global scale."""
    from image_segmentation_lab_tpu.models.losses import SiLogLoss
    pred = np.abs(_rand(rng, 1, 8, 8)) + 0.1
    tgt = np.abs(_rand(rng, 1, 8, 8)) + 0.1
    fn = SiLogLoss(lambd=1.0)
    a = float(fn(jnp.asarray(pred), jnp.asarray(tgt)))
    b = float(fn(jnp.asarray(pred * 7.0), jnp.asarray(tgt)))
    np.testing.assert_allclose(a, b, rtol=1e-3)


# ---------------------------------------------------------------------------
# Hausdorff-distance loss (on-device EDT vs scipy golden)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape,p_fg", [
    ((16, 16), 0.5), ((24, 16), 0.2), ((17, 13), 0.8), ((8, 8), 0.05),
])
def test_edt_sq_matches_scipy(rng, shape, p_fg):
    from scipy.ndimage import distance_transform_edt

    from image_segmentation_lab_tpu.models.losses import edt_sq
    mask = rng.rand(*shape) < p_fg
    mask[0, 0] = False  # guarantee background exists
    out = np.asarray(edt_sq(jnp.asarray(mask)))
    ref = distance_transform_edt(mask) ** 2
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_edt_sq_degenerate_masks():
    from image_segmentation_lab_tpu.models.losses import edt_sq
    # no foreground: all zeros (scipy convention)
    np.testing.assert_allclose(
        np.asarray(edt_sq(jnp.zeros((8, 8), bool))), 0.0)
    # no background: defined as zeros here (scipy is undefined)
    np.testing.assert_allclose(
        np.asarray(edt_sq(jnp.ones((8, 8), bool))), 0.0)


def test_hausdorff_loss_matches_scipy_derivation(rng):
    from scipy.ndimage import distance_transform_edt

    from image_segmentation_lab_tpu.models.losses import (
        HuasdorffDisstanceLoss)
    N, H, W, C = 2, 16, 16, 3
    pred = _rand(rng, N, H, W, C)
    label = rng.randint(0, C, (N, H, W))
    label[0, :2] = 255  # ignore region
    out = float(HuasdorffDisstanceLoss()(jnp.asarray(pred),
                                         jnp.asarray(label)))

    probs = TF.softmax(torch.tensor(pred), dim=-1).numpy()
    valid = label != 255
    tgt = np.where(valid, label, 0)
    seg = probs.argmax(-1)
    total = np.zeros(N)
    for c in range(1, C):
        gt_dtm2 = np.stack([distance_transform_edt(tgt[b] == c) ** 2
                            for b in range(N)])
        seg_dtm2 = np.stack([distance_transform_edt(seg[b] == c) ** 2
                             for b in range(N)])
        y = (tgt == c).astype(np.float32)
        delta = (probs[..., c] - y) ** 2 * valid
        total += (delta * (gt_dtm2 + seg_dtm2)).mean(axis=(1, 2))
    ref = (total / C).mean()
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_hausdorff_loss_gradient_flows_through_probs_only(rng):
    from image_segmentation_lab_tpu.models.losses import (
        HuasdorffDisstanceLoss)
    pred = jnp.asarray(_rand(rng, 1, 8, 8, 2))
    label = jnp.asarray(rng.randint(0, 2, (1, 8, 8)))
    fn = HuasdorffDisstanceLoss()
    g = jax.grad(lambda p: fn(p, label))(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0
