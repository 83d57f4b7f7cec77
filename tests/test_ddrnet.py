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
