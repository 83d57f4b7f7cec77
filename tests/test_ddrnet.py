"""DDRNet: DAPPM golden numerics + dual-branch backbone contract
(beyond-reference realtime family)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.backbones.ddrnet import DAPPM
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import P, _t, assert_feature_parity, randomize, \
    tbn, tconv

torch.set_grad_enabled(False)


def _bnreluconv(x, p, s, path, k=1, stride=1, pad=0):
    h = TF.relu(tbn(x, p, s, path + "/bn"))
    return tconv(h, P(p, path + "/conv/weight"), stride=stride, padding=pad)


def t_dappm(p, s, x):
    size = x.shape[2:]
    outs = [_bnreluconv(x, p, s, "scale0")]
    pools = [TF.avg_pool2d(x, 5, 2, padding=2, count_include_pad=True),
             TF.avg_pool2d(x, 9, 4, padding=4, count_include_pad=True),
             TF.avg_pool2d(x, 17, 8, padding=8, count_include_pad=True),
             TF.adaptive_avg_pool2d(x, 1)]
    for i, pool in enumerate(pools):
        y = _bnreluconv(pool, p, s, f"scales_{i}")
        y = TF.interpolate(y, size=size, mode="bilinear",
                           align_corners=False)
        outs.append(_bnreluconv(y + outs[-1], p, s, f"processes_{i}",
                                k=3, pad=1))
    out = _bnreluconv(torch.cat(outs, 1), p, s, "compression")
    return out + _bnreluconv(x, p, s, "shortcut")


def test_dappm_matches_torch(rng):
    m = DAPPM(16, 4, 8, norm_cfg=dict(type="BN"))
    x = rng.randn(2, 16, 16, 16).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=171)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    ref = t_dappm(variables["params"], variables["batch_stats"],
                  _t(x.transpose(0, 3, 1, 2)))
    assert_feature_parity(out, ref)


def test_ddrnet_backbone_contract(rng):
    m = build_module_from_cfg(dict(type="DDRNet", channels=8,
                                   ppm_channels=16,
                                   norm_cfg=dict(type="BN")), BACKBONE)
    x = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    aux, out = m.apply(variables, x, mutable=False)
    # aux: 1/8 @2C (spatial tap); out: merged 1/8 @4C
    assert aux.shape == (1, 16, 16, 16)
    assert out.shape == (1, 16, 16, 32)
    # context branch params reach 16C through the stride-2 Bottleneck
    assert "layer5_0" in variables["params"]


def test_ddrnet_trains_one_step(rng):
    from image_segmentation_lab_tpu.core.builder import build_optimizer
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                        make_train_step)
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="DDRNet", channels=8, ppm_channels=16,
                      norm_cfg=dict(type="BN")),
        decode_head=dict(type="FCNHead", in_channels=32, in_index=1,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2, norm_cfg=dict(type="BN"),
                         loss_decode=dict(type="CrossEntropyLoss")),
        auxiliary_head=dict(type="FCNHead", in_channels=16, in_index=0,
                            channels=8, num_convs=1, concat_input=False,
                            num_classes=2, norm_cfg=dict(type="BN"),
                            loss_decode=dict(type="CrossEntropyLoss",
                                             loss_weight=0.4)))
    model = build_segmentor(cfg)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9))
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 2, (2, 64, 64)).astype(np.int32))
    state = create_train_state(model, jax.random.PRNGKey(0), img[:1],
                               gt[:1], tx)
    step = make_train_step(model, tx, donate=False)
    s1, lv = step(state, img, gt, jax.random.PRNGKey(1))
    assert np.isfinite(float(lv["loss"]))
    assert int(jax.device_get(s1.step)) == 1


def t_segmenthead(p, s, x, path):
    """Official DDRNet/PIDNet segmenthead: bn-relu-conv3x3-bn-relu-conv1x1
    (torch-functional twin over the jax weights)."""
    h = TF.relu(tbn(x, p, s, f"{path}/conv/bn"))
    h = tconv(h, P(p, f"{path}/conv/conv/weight"), stride=1, padding=1)
    h = TF.relu(tbn(h, p, s, f"{path}/norm"))
    return tconv(h, P(p, f"{path}/cls/weight"),
                 bias=P(p, f"{path}/cls/bias"))


def _ddrhead(rng, num_classes=3):
    from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
    head = build_module_from_cfg(dict(
        type="DDRHead", in_channels=32, channels=16,
        num_classes=num_classes, dropout_ratio=0.0,
        norm_cfg=dict(type="BN"), align_corners=False,
        loss_decode=[dict(type="OhemCrossEntropy", thres=0.9, min_kept=64),
                     dict(type="OhemCrossEntropy", thres=0.9, min_kept=64,
                          loss_weight=0.4)]), DECODEHEAD)
    aux = rng.randn(2, 16, 16, 16).astype(np.float32)
    fused = rng.randn(2, 16, 16, 32).astype(np.float32)
    inputs = [jnp.asarray(aux), jnp.asarray(fused)]
    # init through the train arm so both segmenthead branches materialize
    gt0 = jnp.zeros((2, 32, 32), jnp.int32)
    variables = head.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        inputs, gt0, train=False, method="forward_train")
    variables = randomize(variables, seed=55)
    return head, variables, inputs, fused


def test_ddrhead_matches_official_segmenthead(rng):
    head, variables, inputs, fused = _ddrhead(rng)
    out = head.apply(variables, inputs, mutable=False)
    ref = t_segmenthead(variables["params"], variables["batch_stats"],
                        _t(fused.transpose(0, 3, 1, 2)), "context_head")
    assert_feature_parity(out, ref)


def test_ddrhead_train_path_two_losses(rng):
    head, variables, inputs, _ = _ddrhead(rng)
    gt = jnp.asarray(rng.randint(0, 3, (2, 32, 32)).astype(np.int32))
    (logit, loss), _ = head.apply(
        variables, inputs, gt, train=True, method="forward_train",
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)})
    assert logit.shape == (2, 32, 32, 3)  # resized to the label grid
    assert {"loss_context", "loss_spatial", "acc_seg"} <= set(loss)
    assert np.isfinite(float(loss["loss_context"]))
    assert np.isfinite(float(loss["loss_spatial"]))


def test_ddrnet_ddrhead_segmentor_trains_and_infers(rng):
    """The shipped DDRHead config wiring: one head, two segmenthead
    branches, OHEM context + 0.4x spatial losses."""
    from image_segmentation_lab_tpu.core.builder import build_optimizer
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                        make_train_step)
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="DDRNet", channels=8, ppm_channels=16,
                      norm_cfg=dict(type="BN")),
        decode_head=dict(type="DDRHead", in_channels=32, channels=16,
                         num_classes=2, dropout_ratio=0.0,
                         norm_cfg=dict(type="BN"),
                         loss_decode=[
                             dict(type="OhemCrossEntropy", thres=0.9,
                                  min_kept=256),
                             dict(type="OhemCrossEntropy", thres=0.9,
                                  min_kept=256, loss_weight=0.4)]),
        test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9))
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(0, 2, (2, 64, 64)).astype(np.int32))
    state = create_train_state(model, jax.random.PRNGKey(0), img[:1],
                               gt[:1], tx)
    step = make_train_step(model, tx, donate=False)
    s1, lv = step(state, img, gt, jax.random.PRNGKey(1))
    assert np.isfinite(float(lv["loss"]))
    probs = model.apply({"params": s1.params,
                         "batch_stats": s1.batch_stats},
                        img, method="inference")
    assert probs.shape == (2, 64, 64, 2)
