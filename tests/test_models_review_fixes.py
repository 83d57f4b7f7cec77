"""Regression tests for the round-3 models-package review findings.

Each test pins a reference-semantics divergence that the review surfaced:
HRNet transition freezing (reference hrnet.py:590-604), conditional
zero-init-residual (resnet.py:443-463), FPN num_outs, mask-BCE weight
semantics (cross_entropy_loss.py:203), non-zero padding_mode on raw
convs, BN track_running_stats=False eval behavior, and GELU's torch
string 'approximate' forms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE, NECK
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

torch.set_grad_enabled(False)


def test_hrnet_transition_frozen_with_its_stage():
    """frozen_stages=1 freezes layer1 AND transition1 (the transition out
    of stage 1), NOT transition2 (reference hrnet.py:590-604)."""
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                    num_blocks=(1,), num_channels=(8,)),
        stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                    num_blocks=(1, 1), num_channels=(8, 16)),
        stage3=dict(num_modules=1, num_branches=3, block="BASIC",
                    num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
        stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                    num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)))
    m = build_module_from_cfg(dict(type="HRNet", extra=extra,
                                   frozen_stages=1,
                                   norm_cfg=dict(type="BN",
                                                 requires_grad=True)),
                              BACKBONE)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    frozen = v.get("frozen_params", {})
    params = v.get("params", {})
    # transition1 (ours: transitions_0, feeding stage 2) frozen with stage 1
    assert any(k.startswith("transitions_0") for k in frozen), sorted(frozen)
    # transition2 (transitions_1) still trainable (stage 2 not frozen)
    assert any(k.startswith("transitions_1") for k in params)
    assert not any(k.startswith("transitions_1") for k in frozen)


@pytest.mark.parametrize("init_cfg,expect_zero", [
    (None, True),
    (dict(type="Kaiming", layer="Conv2d"), False),
])
def test_zero_init_residual_only_under_default_init(init_cfg, expect_zero):
    """reference resnet.py:443-463: the residual-norm zero init applies
    ONLY when pretrained and init_cfg are both None."""
    m = build_module_from_cfg(dict(type="ResNet", depth=50, num_stages=2,
                                   strides=(1, 2), dilations=(1, 1),
                                   out_indices=(1,), init_cfg=init_cfg,
                                   norm_cfg=dict(type="BN",
                                                 requires_grad=True)),
                              BACKBONE)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)
    gamma = np.asarray(v["params"]["layer1"]["blocks_0"]["bn3"]["weight"])
    if expect_zero:
        np.testing.assert_allclose(gamma, 0.0)
    else:
        np.testing.assert_allclose(gamma, 1.0)


def test_fpn_num_outs_adds_pooled_levels():
    fpn = build_module_from_cfg(dict(type="FPN", in_channels=[8, 16],
                                     out_channels=8, num_outs=4), NECK)
    feats = (jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 8, 8, 16)))
    v = fpn.init(jax.random.PRNGKey(0), feats, False)
    outs = fpn.apply(v, feats, False)
    assert len(outs) == 4
    assert outs[2].shape == (1, 4, 4, 8)   # stride-2 subsample of outs[1]
    assert outs[3].shape == (1, 2, 2, 8)


def test_mask_cross_entropy_weight_matches_torch():
    """class_weight rescales the WHOLE per-element BCE loss (torch
    F.binary_cross_entropy_with_logits(weight=...)), not pos_weight."""
    from image_segmentation_lab_tpu.models.losses.cross_entropy_loss import \
        mask_cross_entropy
    rng = np.random.RandomState(0)
    pred = rng.randn(3, 4, 4, 5).astype(np.float32)
    target = (rng.rand(3, 4, 4) > 0.5).astype(np.float32)
    label = np.array([1, 4, 2])
    weight = rng.rand(4).astype(np.float32)  # broadcasts over trailing dim
    ours = float(mask_cross_entropy(jnp.asarray(pred), jnp.asarray(target),
                                    jnp.asarray(label),
                                    class_weight=weight))
    inds = torch.arange(3)
    pred_slice = torch.from_numpy(pred).permute(0, 3, 1, 2)[inds,
                                                            label]  # N,H,W
    ref = TF.binary_cross_entropy_with_logits(
        pred_slice, torch.from_numpy(target),
        weight=torch.from_numpy(weight), reduction="mean")
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_conv_reflect_padding_matches_torch():
    from image_segmentation_lab_tpu.models.builder import build_conv_layer
    conv = build_conv_layer(dict(type="Conv2d"), 3, 4, 3, padding=1,
                            padding_mode="reflect", bias=False)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    v = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    out = conv.apply(v, jnp.asarray(x), False)
    w = np.asarray(v["params"]["weight"]).transpose(3, 2, 0, 1)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = TF.pad(xt, (1, 1, 1, 1), mode="reflect")
    ref = TF.conv2d(xt, torch.from_numpy(w))
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_bn_no_track_running_stats_uses_batch_stats_in_eval():
    from image_segmentation_lab_tpu.models.builder import build_norm_layer
    bn = build_norm_layer(dict(type="BN", track_running_stats=False), 4)[1]
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 5, 5, 4) * 3 + 7).astype(np.float32)
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    out = bn.apply(v, jnp.asarray(x), False)  # EVAL mode
    ref = TF.batch_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        None, None, torch.ones(4), torch.zeros(4),
                        training=True, momentum=0.0, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("approximate,expect_tanh", [
    ("none", False), ("tanh", True), (False, False), (True, True)])
def test_gelu_approximate_string_forms(approximate, expect_tanh):
    from image_segmentation_lab_tpu.models.builder import \
        build_activation_layer
    g = build_activation_layer(dict(type="GELU", approximate=approximate))
    x = jnp.asarray(np.linspace(-3, 3, 64, dtype=np.float32))
    out = g.apply({}, x, False)
    ref = jax.nn.gelu(x, approximate=expect_tanh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-7)
