"""Grad-CAM golden tests (core/inference/cam.py + the CLI tool).

The reference rides pytorch_grad_cam's GradCAM with a masked-sum class
objective (reference tools/analysis_tools/cam_visualization.py:33-57):
pool the objective's gradients over the target layer, weight the
activations, ReLU, upsample, normalize.  Here the same procedure runs on
``jax.grad``; these tests pin it against an INDEPENDENT derivation:

* the gradient is re-computed by finite differences of the model's own
  score function (no jax.grad involved) — with a purely linear decode
  head (FCNHead num_convs=0 → conv_seg only) the difference quotient is
  exact up to f32 rounding;
* the pooling/weighting/ReLU/resize/normalize tail is re-computed in
  numpy with cv2's bilinear resize.
"""

import subprocess
import sys
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.core.inference.cam import (
    SemanticSegmentationTarget, grad_cam, show_cam_on_image)
from image_segmentation_lab_tpu.core.inference.infer import InferenceModel
from image_segmentation_lab_tpu.models.builder import build_segmentor

REPO_ROOT = Path(__file__).resolve().parents[1]


def _tiny_linear_head_model():
    """EncoderDecoder whose decode head is a single 1x1 conv (linear in
    the backbone features), so finite differences of the CAM objective
    are exact."""
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(3,), dilations=(1, 1, 1, 1),
                      strides=(1, 2, 2, 2),
                      norm_cfg=dict(type="BN", requires_grad=True)),
        decode_head=dict(type="FCNHead", in_channels=512, in_index=0,
                         channels=512, num_convs=0, concat_input=False,
                         dropout_ratio=0.0, num_classes=3,
                         align_corners=False,
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 64, 3), jnp.float32),
                           method="encode_decode")
    return InferenceModel(model=model, variables=variables, cfg=cfg)


def test_grad_cam_matches_finite_difference_derivation():
    inf = _tiny_linear_head_model()
    rng = np.random.RandomState(0)
    img = rng.randn(64, 64, 3).astype(np.float32)
    mask = (rng.rand(64, 64) > 0.5).astype(np.float32)

    from image_segmentation_lab_tpu.utils.ops import resize
    model, variables = inf.model, inf.variables
    x = jnp.asarray(img)[None]
    feats = model.apply(variables, x, method="extract_feat")
    feats = list(feats) if isinstance(feats, (list, tuple)) else [feats]
    feat = feats[-1]  # (1, 2, 2, 512)
    h, w, c = feat.shape[1], feat.shape[2], feat.shape[3]

    any_nondegenerate = False
    for category in range(3):
        target = SemanticSegmentationTarget(category, mask)
        cam = grad_cam(inf, img, target, feature_index=-1)
        assert cam.shape == (64, 64)
        assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6

        # ---- independent numpy re-derivation ----------------------------
        @jax.jit
        def score(feat_k, category=category):
            logits = model.apply(variables, (feat_k,),
                                 method="decode_from_features")
            logits = resize(logits, size=(64, 64), mode="bilinear",
                            align_corners=False)
            return jnp.sum(logits[0][..., category] * jnp.asarray(mask))

        # forward differences: exact for the linear head (eps=1 is fine)
        base = float(score(feat))
        weights = np.zeros((c,), np.float32)
        for ci in range(c):
            weights[ci] = (float(score(feat.at[..., ci].add(1.0))) - base) \
                / (h * w)

        f = np.asarray(feat[0])  # (h, w, c)
        cam_np = np.maximum((weights[None, None, :] * f).sum(-1), 0.0)
        cam_np = cv2.resize(cam_np, (64, 64),
                            interpolation=cv2.INTER_LINEAR)
        cam_np = cam_np - cam_np.min()
        cam_np = cam_np / max(cam_np.max(), 1e-8)
        any_nondegenerate = any_nondegenerate or cam_np.max() > 0
        np.testing.assert_allclose(cam, cam_np, atol=5e-3)
    assert any_nondegenerate, "all-category-degenerate CAM — setup broken"


def test_show_cam_on_image_overlay_properties():
    img = np.full((8, 8, 3), 128, np.uint8)
    cam = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    out = show_cam_on_image(img, cam, alpha=0.5)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
    # alpha=0: pure image
    np.testing.assert_array_equal(show_cam_on_image(img, cam, alpha=0.0),
                                  img)


def test_cam_cli_end_to_end(tmp_path):
    """The tool runs init_model → inference → grad_cam → overlay write
    (reference cam_visualization.py:60-142)."""
    img_path = tmp_path / "in.png"
    rng = np.random.RandomState(0)
    cv2.imwrite(str(img_path), rng.randint(0, 255, (80, 96, 3),
                                           dtype=np.uint8))
    out_path = tmp_path / "cam_out.jpg"
    cmd = [sys.executable,
           str(REPO_ROOT / "tools/analysis_tools/cam_visualization.py"),
           "--img", str(img_path),
           "--network-cfg",
           str(REPO_ROOT / "configs/network/fcn/fcn_r18_synthetic.py"),
           "--pipeline",
           str(REPO_ROOT / "configs/augmentation/synthetic_val_transform.yaml"),
           "--category", "1", "--out-file", str(out_path),
           "--device", "cpu"]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                         cwd=str(REPO_ROOT))
    assert res.returncode == 0, res.stderr[-2000:]
    assert out_path.exists()
    overlay = cv2.imread(str(out_path))
    assert overlay is not None and overlay.shape[2] == 3
    assert "CAM written" in res.stdout
