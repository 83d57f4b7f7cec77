"""PointRend: point_sample golden vs torch grid_sample, FPNHead golden,
PointHead MLP golden, subdivision-inference properties, cascade wiring
(beyond-reference family; ops/point_sample.py,
models/decode_heads/{fpn_head,point_head}.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
from image_segmentation_lab_tpu.models.builder import (build_module_from_cfg,
                                                       build_segmentor)
from image_segmentation_lab_tpu.ops.point_sample import (
    calculate_uncertainty, point_sample)

from test_swin import t_linear
from test_zoo_torch_parity import _t, randomize, tconv

torch.set_grad_enabled(False)


def t_point_sample(feat_nchw, points, align_corners=False, mode="bilinear"):
    grid = (2.0 * points - 1.0).unsqueeze(2)          # (N, P, 1, 2)
    out = TF.grid_sample(feat_nchw, grid, mode=mode,
                         padding_mode="zeros", align_corners=align_corners)
    return out[..., 0]                                 # (N, C, P)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_point_sample_matches_grid_sample(rng, align_corners, mode):
    feat = rng.randn(2, 7, 9, 5).astype(np.float32)
    # include points outside [0,1] to pin the zeros padding
    pts = rng.uniform(-0.2, 1.2, (2, 33, 2)).astype(np.float32)
    out = point_sample(jnp.asarray(feat), jnp.asarray(pts),
                       align_corners=align_corners, mode=mode)
    ref = t_point_sample(_t(feat.transpose(0, 3, 1, 2)), _t(pts),
                         align_corners=align_corners, mode=mode)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1),
                               ref.numpy(), atol=2e-5, rtol=1e-4)


def test_calculate_uncertainty(rng):
    logits = rng.randn(2, 11, 4).astype(np.float32)
    unc = np.asarray(calculate_uncertainty(jnp.asarray(logits)))
    top2 = np.sort(logits, axis=-1)[..., -2:]
    np.testing.assert_allclose(unc, top2[..., 0] - top2[..., 1], atol=1e-6)
    # binary head: distance to the decision boundary
    blogit = rng.randn(2, 11, 1).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(calculate_uncertainty(jnp.asarray(blogit))),
        -np.abs(blogit[..., 0]), atol=1e-6)


FPN_HEAD = dict(type="FPNHead", in_channels=[8, 8, 8], in_index=[0, 1, 2],
                input_transform="multiple_select",
                feature_strides=[4, 8, 16], channels=8, dropout_ratio=-1,
                num_classes=3, norm_cfg=None,
                loss_decode=dict(type="CrossEntropyLoss"))


def t_fpn_head(params, feats_nchw):
    def conv_relu(x, p):
        return TF.relu(tconv(x, p["conv"]["weight"], padding=1,
                             bias=np.asarray(p["conv"]["bias"])))
    out = None
    for i, x in enumerate(feats_nchw):
        y = x
        for k in range(max(1, i)):
            y = conv_relu(y, params[f"scale_heads_{i}_{2 * k if i else k}"])
            if i > 0:
                y = TF.interpolate(y, scale_factor=2, mode="bilinear",
                                   align_corners=False)
        out = y if out is None else out + y
    return tconv(out, params["conv_seg"]["weight"],
                 bias=np.asarray(params["conv_seg"]["bias"]))


def test_fpn_head_matches_torch(rng):
    head = build_module_from_cfg(FPN_HEAD, DECODEHEAD)
    feats = [rng.randn(2, 16 // s, 16 // s, 8).astype(np.float32)
             for s in (2, 4, 8)]
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          [jnp.asarray(f) for f in feats])
    variables = randomize(variables, seed=13)
    out = head.apply(variables, [jnp.asarray(f) for f in feats])
    ref = t_fpn_head(variables["params"],
                     [_t(f.transpose(0, 3, 1, 2)) for f in feats])
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-4)


POINT_HEAD = dict(type="PointHead", in_channels=[8], in_index=[0],
                  input_transform="multiple_select", channels=16, num_fcs=3,
                  coarse_pred_each_layer=True, dropout_ratio=-1,
                  num_classes=3, num_points=32, oversample_ratio=3,
                  importance_sample_ratio=0.75, subdivision_steps=2,
                  subdivision_num_points=48, scale_factor=2,
                  loss_decode=dict(type="CrossEntropyLoss"))


def t_point_mlp(params, fine, coarse):
    x = torch.cat([fine, coarse], dim=-1)
    for i in range(3):
        x = TF.relu(t_linear(x, params[f"fcs_{i}"]))
        x = torch.cat([x, coarse], dim=-1)
    return t_linear(x, params["fc_seg"])


def test_point_head_mlp_matches_torch(rng):
    head = build_module_from_cfg(POINT_HEAD, DECODEHEAD)
    feats = [jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))]
    coarse = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          feats, prev_logits=coarse)
    variables = randomize(variables, seed=17)
    pts = jnp.asarray(rng.uniform(0, 1, (2, 12, 2)).astype(np.float32))
    fine = point_sample(feats[0], pts)
    cpts = point_sample(coarse, pts)
    out = head.apply(variables, fine, cpts, False,
                     method="_point_forward")
    ref = t_point_mlp(variables["params"], _t(np.asarray(fine)),
                      _t(np.asarray(cpts)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=3e-5, rtol=1e-4)


def test_point_head_subdivision_refines_only_selected_points(rng):
    head = build_module_from_cfg(POINT_HEAD, DECODEHEAD)
    feats = [jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))]
    coarse = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          feats, prev_logits=coarse)
    refined = head.apply(variables, feats, False, coarse)
    assert refined.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(refined)).all()

    # one-step variant: cells NOT in the top-48 uncertainty set must equal
    # the plain bilinear upsample; selected cells must carry MLP output
    head1 = build_module_from_cfg(dict(POINT_HEAD, subdivision_steps=1),
                                  DECODEHEAD)
    refined1 = np.asarray(head1.apply(variables, feats, False, coarse))
    from image_segmentation_lab_tpu.utils.ops import resize
    up = resize(coarse, size=(8, 8), mode="bilinear", align_corners=False)
    unc = calculate_uncertainty(up).reshape(1, 64)
    _, idx = jax.lax.top_k(unc, 48)
    sel = np.asarray(idx)[0]
    untouched = np.setdiff1d(np.arange(64), sel)
    assert untouched.size == 64 - 48
    flat_ref = refined1.reshape(64, 3)
    flat_up = np.asarray(up).reshape(64, 3)
    np.testing.assert_allclose(flat_ref[untouched], flat_up[untouched],
                               atol=1e-6)
    assert np.abs(flat_ref[sel] - flat_up[sel]).max() > 1e-4


def test_pointrend_cascade_train_and_infer(rng):
    cfg = dict(
        type="CascadeEncoderDecoder", num_stages=2,
        backbone=dict(type="ResNetV1c", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 1, 1),
                      strides=(1, 2, 2, 2),
                      norm_cfg=dict(type="SyncBatchNorm"),
                      base_channels=8, stem_channels=8),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=8,
                  num_outs=4),
        decode_head=[
            dict(FPN_HEAD, in_channels=[8, 8, 8, 8], in_index=[0, 1, 2, 3],
                 feature_strides=[4, 8, 16, 32], channels=8, num_classes=2),
            dict(POINT_HEAD, num_classes=2),
        ],
        test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 2, (2, 32, 32)).astype(np.int32))
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, img, gt, img_metas={}, rescale=False,
                           return_loss=True, train=True)
    _, losses = model.apply(variables, img, gt, img_metas={}, rescale=False,
                            return_loss=True, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)})
    keys = set(losses)
    assert {"decode.loss_point_ce", "decode.acc_point",
            "decode_0.loss_ce"} <= keys, keys
    for v in losses.values():
        assert np.isfinite(float(jnp.mean(jnp.asarray(v))))

    probs = model.apply(variables, img, method="inference")
    assert probs.shape == (2, 32, 32, 2)
    assert np.isfinite(np.asarray(probs)).all()
