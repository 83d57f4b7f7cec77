"""STDC family: module/backbone wiring, detail-target golden vs a torch
re-derivation, context-path shapes (models/backbones/stdc.py,
models/decode_heads/stdc_head.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import (BACKBONE,
                                                          DECODEHEAD)
from image_segmentation_lab_tpu.models.backbones.stdc import STDCModule
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
from image_segmentation_lab_tpu.models.decode_heads.stdc_head import \
    detail_target

torch.set_grad_enabled(False)


def test_stdc_module_channel_plan(rng):
    m = STDCModule(16, 64, stride=1, norm_cfg=dict(type="BN"))
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out.shape == (1, 8, 8, 64)  # 32+16+8+8 concat
    m2 = STDCModule(16, 64, stride=2, norm_cfg=dict(type="BN"))
    v2 = m2.init({"params": jax.random.PRNGKey(0)}, x)
    out2 = m2.apply(v2, x)
    assert out2.shape == (1, 4, 4, 64)  # all branches land at 1/2


def test_stdcnet_stage_strides(rng):
    net = build_module_from_cfg(
        dict(type="STDCNet", stdc_type="STDCNet1",
             channels=(8, 16, 32, 48, 64), out_indices=(2, 3, 4),
             norm_cfg=dict(type="BN")), BACKBONE)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    v = net.init({"params": jax.random.PRNGKey(0)}, x)
    s3, s4, s5 = net.apply(v, x)
    assert s3.shape == (1, 8, 8, 32)    # 1/8
    assert s4.shape == (1, 4, 4, 48)    # 1/16
    assert s5.shape == (1, 2, 2, 64)    # 1/32


def t_detail_target(gt, thr=0.1):
    lap = torch.tensor([[-1., -1., -1.], [-1., 8., -1.], [-1., -1., -1.]]
                       ).view(1, 1, 3, 3)
    x = torch.from_numpy(np.asarray(gt)).float().unsqueeze(1)
    H, W = x.shape[-2:]
    maps = []
    for s in (1, 2, 4):
        m = TF.conv2d(x, lap, stride=s, padding=1).clamp(min=0)
        m = (m > thr).float()
        if s > 1:
            m = TF.interpolate(m, size=(H, W), mode="nearest")
            m = (m > thr).float()
        maps.append(m)
    fused = 0.6 * maps[0] + 0.3 * maps[1] + 0.1 * maps[2]
    return (fused > thr).long()[:, 0]


def test_detail_target_matches_torch(rng):
    gt = rng.randint(0, 2, (2, 16, 16)).astype(np.int32)
    ours = np.asarray(detail_target(jnp.asarray(gt)))
    ref = t_detail_target(gt).numpy()
    np.testing.assert_array_equal(ours, ref)
    # a constant mask has no boundaries
    flat = np.asarray(detail_target(jnp.zeros((1, 16, 16), jnp.int32)))
    assert flat.sum() == 0


def test_stdc_head_scores_boundary_not_mask(rng):
    head = build_module_from_cfg(
        dict(type="STDCHead", in_channels=8, channels=4, num_convs=1,
             num_classes=2, in_index=0, concat_input=False,
             dropout_ratio=0.0, norm_cfg=dict(type="BN"),
             loss_decode=[dict(type="CrossEntropyLoss", use_sigmoid=True),
                          dict(type="DiceLoss", loss_weight=1.0)]),
        DECODEHEAD)
    x = [jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))]
    gt = jnp.asarray(rng.randint(0, 2, (1, 16, 16)).astype(np.int32))
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          x, gt, method="forward_train", train=True)
    (_, losses), _ = head.apply(variables, x, gt, method="forward_train",
                                train=True, mutable=["batch_stats"])
    assert {"loss_ce", "loss_dice", "acc_seg"} <= set(losses)
    for v in losses.values():
        assert np.isfinite(float(v))


def test_context_path_tap_shapes(rng):
    net = build_module_from_cfg(
        dict(type="STDCContextPathNet",
             backbone_cfg=dict(type="STDCNet", stdc_type="STDCNet1",
                               channels=(8, 16, 32, 48, 64),
                               out_indices=(2, 3, 4),
                               norm_cfg=dict(type="BN")),
             last_in_channels=(64, 48), out_channels=24,
             ffm_cfg=dict(in_channels=56, out_channels=40),
             norm_cfg=dict(type="BN")), BACKBONE)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    v = net.init({"params": jax.random.PRNGKey(0)}, x)
    ffm, arm16, arm8, s3 = net.apply(v, x)
    assert ffm.shape == (1, 8, 8, 40)      # fused 1/8
    assert arm16.shape == (1, 4, 4, 24)    # context at 1/16
    assert arm8.shape == (1, 8, 8, 24)     # context refined to 1/8
    assert s3.shape == (1, 8, 8, 32)       # raw stage 3 for the detail head
