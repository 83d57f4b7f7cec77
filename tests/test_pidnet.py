"""PIDNet family (beyond-reference): torch-golden PagFM/PAPPM/LightBag
numerics, boundary-target and OHEM/boundary loss goldens vs independent
numpy/torch derivations, backbone contracts, full-segmentor train/eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.backbones.pidnet import (LightBag,
                                                                PagFM, PAPPM)
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
from image_segmentation_lab_tpu.models.decode_heads.pid_head import \
    boundary_from_label
from image_segmentation_lab_tpu.models.losses import (BoundaryLoss,
                                                      OhemCrossEntropy)

from test_zoo_torch_parity import P, _t, assert_feature_parity, randomize, \
    tbn, tconv

torch.set_grad_enabled(False)


def _convbn(x, p, s, path, stride=1, pad=0, groups=1):
    h = tconv(x, P(p, path + "/conv/weight"), stride=stride, padding=pad,
              groups=groups)
    return tbn(h, p, s, path + "/bn")


def _bnreluconv(x, p, s, path, stride=1, pad=0, groups=1):
    h = TF.relu(tbn(x, p, s, path + "/bn"))
    return tconv(h, P(p, path + "/conv/weight"), stride=stride, padding=pad,
                 groups=groups)


def t_pagfm(p, s, x_p, x_i):
    size = x_p.shape[2:]
    f_i = TF.interpolate(_convbn(x_i, p, s, "f_i"), size=size,
                         mode="bilinear", align_corners=False)
    f_p = _convbn(x_p, p, s, "f_p")
    sigma = torch.sigmoid((f_p * f_i).sum(dim=1, keepdim=True))
    x_i = TF.interpolate(x_i, size=size, mode="bilinear",
                         align_corners=False)
    return sigma * x_i + (1 - sigma) * x_p


def test_pagfm_matches_torch(rng):
    m = PagFM(16, 8, norm_cfg=dict(type="BN"))
    x_p = rng.randn(2, 16, 16, 16).astype(np.float32)
    x_i = rng.randn(2, 8, 8, 16).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x_p),
                       jnp.asarray(x_i))
    variables = randomize(variables, seed=201)
    out = m.apply(variables, jnp.asarray(x_p), jnp.asarray(x_i),
                  mutable=False)
    ref = t_pagfm(variables["params"], variables["batch_stats"],
                  _t(x_p.transpose(0, 3, 1, 2)),
                  _t(x_i.transpose(0, 3, 1, 2)))
    assert_feature_parity(out, ref)


def t_pappm(p, s, x):
    size = x.shape[2:]
    x_ = _bnreluconv(x, p, s, "scale0")
    pools = [TF.avg_pool2d(x, 5, 2, padding=2, count_include_pad=True),
             TF.avg_pool2d(x, 9, 4, padding=4, count_include_pad=True),
             TF.avg_pool2d(x, 17, 8, padding=8, count_include_pad=True),
             TF.adaptive_avg_pool2d(x, 1)]
    feats = []
    for i, pool in enumerate(pools):
        y = _bnreluconv(pool, p, s, f"scales_{i}")
        feats.append(TF.interpolate(y, size=size, mode="bilinear",
                                    align_corners=False) + x_)
    scale_out = _bnreluconv(torch.cat(feats, 1), p, s, "processes",
                            pad=1, groups=4)
    out = _bnreluconv(torch.cat([x_, scale_out], 1), p, s, "compression")
    return out + _bnreluconv(x, p, s, "shortcut")


def test_pappm_matches_torch(rng):
    m = PAPPM(16, 4, 8, norm_cfg=dict(type="BN"))
    x = rng.randn(2, 16, 16, 16).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=202)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    ref = t_pappm(variables["params"], variables["batch_stats"],
                  _t(x.transpose(0, 3, 1, 2)))
    assert_feature_parity(out, ref)


def t_lightbag(p, s, x_p, x_i, x_d):
    sigma = torch.sigmoid(x_d)
    f_p = _convbn((1 - sigma) * x_i + x_p, p, s, "f_p")
    f_i = _convbn(x_i + sigma * x_p, p, s, "f_i")
    return f_p + f_i


def test_lightbag_matches_torch(rng):
    m = LightBag(12, 12, norm_cfg=dict(type="BN"))
    xs = [rng.randn(2, 8, 8, 12).astype(np.float32) for _ in range(3)]
    variables = m.init(jax.random.PRNGKey(0), *map(jnp.asarray, xs))
    variables = randomize(variables, seed=203)
    out = m.apply(variables, *map(jnp.asarray, xs), mutable=False)
    ref = t_lightbag(variables["params"], variables["batch_stats"],
                     *[_t(x.transpose(0, 3, 1, 2)) for x in xs])
    assert_feature_parity(out, ref)


# ---------------------------------------------------------------- losses

def np_boundary(label, edge_width, ignore_index):
    """Independent loop derivation of boundary_from_label."""
    N, H, W = label.shape
    seeds = np.zeros((N, H, W), bool)
    for n in range(N):
        for i in range(H):
            for j in range(W):
                a = label[n, i, j]
                if a == ignore_index:
                    continue
                for di, dj in ((-1, 0), (0, -1), (-1, -1), (-1, 1)):
                    ii, jj = i + di, j + dj
                    if 0 <= ii < H and 0 <= jj < W:
                        b = label[n, ii, jj]
                        if b != ignore_index and b != a:
                            seeds[n, i, j] = True
    if edge_width <= 1:
        return seeds.astype(np.float32)
    lo = edge_width // 2
    out = np.zeros_like(seeds)
    for n in range(N):
        for i in range(H):
            for j in range(W):
                win = seeds[n, max(0, i - lo):i + edge_width - lo,
                            max(0, j - lo):j + edge_width - lo]
                out[n, i, j] = win.any()
    return out.astype(np.float32)


def test_boundary_from_label_matches_numpy(rng):
    label = rng.randint(0, 3, size=(2, 13, 17)).astype(np.int32)
    label[0, :3, :4] = 255  # ignore region must not seed edges
    for w in (1, 3, 4):
        got = np.asarray(boundary_from_label(jnp.asarray(label), w, 255))
        want = np_boundary(label, w, 255)
        np.testing.assert_array_equal(got, want)


def t_ohem(score, target, thres, min_kept, ignore):
    pred = TF.softmax(score, dim=1)
    pixel_losses = TF.cross_entropy(score, target.long(),
                                    ignore_index=ignore,
                                    reduction="none").view(-1)
    mask = target.view(-1) != ignore
    tmp = target.clone()
    tmp[tmp == ignore] = 0
    pred = pred.gather(1, tmp.unsqueeze(1).long())
    pred, ind = pred.contiguous().view(-1)[mask].contiguous().sort()
    min_value = pred[min(min_kept, pred.numel() - 1)]
    threshold = max(min_value, thres)
    pixel_losses = pixel_losses[mask][ind]
    return pixel_losses[pred < threshold].mean()


@pytest.mark.parametrize("thres,min_kept", [(0.7, 20), (0.9, 500), (0.1, 5)])
def test_ohem_cross_entropy_matches_torch(rng, thres, min_kept):
    logits = rng.randn(2, 9, 9, 4).astype(np.float32)
    label = rng.randint(0, 4, size=(2, 9, 9)).astype(np.int32)
    label[0, 0, :3] = 255
    loss = OhemCrossEntropy(thres=thres, min_kept=min_kept)
    got = float(loss(jnp.asarray(logits), jnp.asarray(label),
                     ignore_index=255))
    want = float(t_ohem(_t(logits.transpose(0, 3, 1, 2)),
                        torch.from_numpy(label), thres, min_kept, 255))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_boundary_loss_matches_torch(rng):
    logits = rng.randn(2, 9, 9, 1).astype(np.float32)
    bd = (rng.rand(2, 9, 9) > 0.8).astype(np.float32)
    got = float(BoundaryLoss()(jnp.asarray(logits), jnp.asarray(bd)))
    log_p = torch.from_numpy(logits.transpose(0, 3, 1, 2)).reshape(1, -1)
    t = torch.from_numpy(bd).view(1, -1)
    w = torch.zeros_like(log_p)
    pos, neg = (t == 1), (t == 0)
    w[pos] = neg.sum() / t.numel()
    w[neg] = pos.sum() / t.numel()
    want = float(TF.binary_cross_entropy_with_logits(log_p, t, w,
                                                     reduction="mean"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


# --------------------------------------------------------- full backbone

def t_basic(x, p, s, prefix, stride=1):
    out = TF.relu(tbn(tconv(x, P(p, prefix + "/conv1/weight"), stride, 1),
                      p, s, prefix + "/bn1"))
    out = tbn(tconv(out, P(p, prefix + "/conv2/weight"), 1, 1),
              p, s, prefix + "/bn2")
    identity = x
    if "downsample_conv" in P(p, prefix):
        identity = tbn(tconv(x, P(p, prefix + "/downsample_conv/weight"),
                             stride, 0), p, s, prefix + "/downsample_bn")
    return TF.relu(out + identity)


def t_bottle(x, p, s, prefix, stride=1):
    out = TF.relu(tbn(tconv(x, P(p, prefix + "/conv1/weight"), 1, 0),
                      p, s, prefix + "/bn1"))
    out = TF.relu(tbn(tconv(out, P(p, prefix + "/conv2/weight"), stride, 1),
                      p, s, prefix + "/bn2"))
    out = tbn(tconv(out, P(p, prefix + "/conv3/weight"), 1, 0),
              p, s, prefix + "/bn3")
    identity = x
    if "downsample_conv" in P(p, prefix):
        identity = tbn(tconv(x, P(p, prefix + "/downsample_conv/weight"),
                             stride, 0), p, s, prefix + "/downsample_bn")
    return TF.relu(out + identity)


def _up(x, size):
    return TF.interpolate(x, size=size, mode="bilinear", align_corners=False)


def t_pidnet_s(p, s, x):
    """Full PIDNet-S forward twin mirroring pidnet.py __call__."""
    for i in range(2):
        x = TF.relu(tbn(tconv(x, P(p, f"stem_{i}/conv/weight"), 2, 1),
                        p, s, f"stem_{i}/bn"))
    for j in range(2):
        x = t_basic(x, p, s, f"layer1_{j}")
    x = TF.relu(x)
    for j in range(2):
        x = t_basic(x, p, s, f"layer2_{j}", stride=2 if j == 0 else 1)

    # stage 3
    x_i = TF.relu(x)
    for j in range(3):
        x_i = t_basic(x_i, p, s, f"i_layer3_{j}", stride=2 if j == 0 else 1)
    x_i = TF.relu(x_i)
    x_p = t_basic(t_basic(x, p, s, "p_layer3_0"), p, s, "p_layer3_1")
    x_d = t_basic(x, p, s, "d_layer3_0")
    comp = _convbn(TF.relu(x_i), p, s, "compression3")
    x_p = t_pagfm(p["pag3"], s["pag3"], x_p, comp)
    x_d = x_d + _up(_convbn(TF.relu(x_i), p, s, "diff3", pad=1),
                    x_d.shape[2:])
    p_tap = x_p

    # stage 4
    x_i2 = TF.relu(x_i)
    for j in range(3):
        x_i2 = t_basic(x_i2, p, s, f"i_layer4_{j}", stride=2 if j == 0 else 1)
    x_i2 = TF.relu(x_i2)
    x_p = t_basic(t_basic(TF.relu(x_p), p, s, "p_layer4_0"), p, s,
                  "p_layer4_1")
    x_d = t_bottle(TF.relu(x_d), p, s, "d_layer4_0")
    comp = _convbn(TF.relu(x_i2), p, s, "compression4")
    x_p = t_pagfm(p["pag4"], s["pag4"], x_p, comp)
    x_d = x_d + _up(_convbn(TF.relu(x_i2), p, s, "diff4", pad=1),
                    x_d.shape[2:])
    d_tap = x_d

    # stage 5 + PAPPM + LightBag
    x_i3 = t_bottle(t_bottle(TF.relu(x_i2), p, s, "i_layer5_0", stride=2),
                    p, s, "i_layer5_1")
    x_p = t_bottle(TF.relu(x_p), p, s, "p_layer5_0")
    x_d = t_bottle(TF.relu(x_d), p, s, "d_layer5_0")
    ctx = t_pappm(p["spp"], s["spp"], x_i3)
    ctx = _up(ctx, x_p.shape[2:])
    out = t_lightbag(p["dfm"], s["dfm"], x_p, ctx, x_d)
    return p_tap, d_tap, out


def test_pidnet_s_full_backbone_matches_torch(rng):
    m = build_module_from_cfg(dict(type="PIDNet", channels=8,
                                   ppm_channels=12,
                                   norm_cfg=dict(type="BN")), BACKBONE)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=205)
    p_tap, d_tap, out = m.apply(variables, jnp.asarray(x), mutable=False)
    refs = t_pidnet_s(variables["params"], variables["batch_stats"],
                      _t(x.transpose(0, 3, 1, 2)))
    for got, want in zip((p_tap, d_tap, out), refs):
        assert_feature_parity(got, want)


# --------------------------------------------------------------- network

def test_pidnet_backbone_contract(rng):
    m = build_module_from_cfg(dict(type="PIDNet", channels=8,
                                   ppm_channels=12,
                                   norm_cfg=dict(type="BN")), BACKBONE)
    x = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    p, d, out = m.apply(variables, x, mutable=False)
    assert p.shape == (1, 16, 16, 16)     # 1/8 @2C
    assert d.shape == (1, 16, 16, 16)     # 1/8 @2C (post-diff4 width)
    assert out.shape == (1, 16, 16, 32)   # merged 1/8 @4C
    assert "i_layer5_1" in variables["params"]   # 16C context depth


def test_pidnet_m_variant_uses_bag_and_dappm(rng):
    m = build_module_from_cfg(dict(type="PIDNet", channels=8,
                                   ppm_channels=12, num_stem_blocks=3,
                                   num_branch_blocks=4,
                                   norm_cfg=dict(type="BN")), BACKBONE)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    p, d, out = m.apply(variables, x, mutable=False)
    assert out.shape == (1, 8, 8, 32)
    # Bag has a single fused conv; LightBag has f_p/f_i
    assert "conv" in variables["params"]["dfm"]
    assert "processes_0" in variables["params"]["spp"]  # DAPPM cascade


def test_pidnet_segmentor_trains_and_infers(rng):
    from image_segmentation_lab_tpu.core.builder import build_optimizer
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                        make_train_step)
    norm = dict(type="BN")
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="PIDNet", channels=8, ppm_channels=12,
                      norm_cfg=norm),
        decode_head=dict(
            type="PIDHead", in_channels=32, channels=32, dropout_ratio=0.0,
            num_classes=3, norm_cfg=norm, edge_width=4,
            loss_decode=[
                dict(type="CrossEntropyLoss", loss_weight=0.4),
                dict(type="OhemCrossEntropy", thres=0.9, min_kept=64),
                dict(type="BoundaryLoss", loss_weight=20.0),
                dict(type="OhemCrossEntropy", thres=0.9, min_kept=64),
            ]),
        test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 3, size=(2, 64, 64)).astype(np.int32))
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9))
    state = create_train_state(model, jax.random.PRNGKey(0), img, gt, tx)
    step = make_train_step(model, tx)
    state, log_vars = step(state, img, gt, jax.random.PRNGKey(1))
    for key in ("decode.loss_sem_p", "decode.loss_sem_i",
                "decode.loss_bd", "decode.loss_sem_bd"):
        assert np.isfinite(float(log_vars[key])), key
    assert float(log_vars["loss"]) > 0
    # eval path uses the merged map only
    probs = model.apply(state.variables(), img[:1], method="inference")
    assert probs.shape == (1, 64, 64, 3)


def test_pidnet_config_builds():
    from image_segmentation_lab_tpu.core.fileio.parse import \
        parse_and_backup_config
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    cfg = parse_and_backup_config("configs/network/pidnet/pidnet-s.py")
    model = build_segmentor(cfg["model"])
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x,
                           method="encode_decode")
    out = model.apply(variables, x, method="encode_decode", mutable=False)
    assert out.shape == (1, 64, 64, 2)
