"""Shape/behavior tests for the full backbone zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.models.builder import BACKBONE


def build_and_run(cfg, hw=(64, 64), train=False):
    from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    return m, variables, outs


def test_resnet_d8_output_stride():
    _, _, outs = build_and_run(dict(
        type="ResNetV1c", depth=50, strides=(1, 2, 1, 1),
        dilations=(1, 1, 2, 4), contract_dilation=True,
        norm_cfg=dict(type="BN", requires_grad=True)))
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 8, 8, 1024), (1, 8, 8, 2048)]


def test_resnet_frozen_stages_structural():
    from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
    m = build_module_from_cfg(dict(type="ResNet", depth=18, frozen_stages=1,
                                   norm_cfg=dict(type="BN",
                                                 requires_grad=True)),
                              BACKBONE)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    assert "frozen_params" in variables
    frozen_top = set(variables["frozen_params"].keys())
    # stem + layer1 frozen; layer2..4 trainable
    assert "conv1" in frozen_top and "layer1" in frozen_top
    assert "layer2" in variables["params"]
    assert "layer1" not in variables["params"]


def test_hrnet_w18_small():
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                    num_blocks=(1,), num_channels=(16,)),
        stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                    num_blocks=(2, 2), num_channels=(8, 16)),
        stage3=dict(num_modules=1, num_branches=3, block="BASIC",
                    num_blocks=(2, 2, 2), num_channels=(8, 16, 32)),
        stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                    num_blocks=(2, 2, 2, 2), num_channels=(8, 16, 32, 64)))
    _, _, outs = build_and_run(dict(type="HRNet", extra=extra,
                                    norm_cfg=dict(type="BN",
                                                  requires_grad=True)))
    shapes = [o.shape for o in outs]
    assert shapes == [(1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 32),
                      (1, 2, 2, 64)]


def test_mobilenet_v2():
    _, _, outs = build_and_run(dict(type="MobileNetV2"))
    shapes = [o.shape for o in outs]
    # out_indices (1,2,4,6): strides 4, 8, 16, 32; channels 24/32/96/320
    assert shapes == [(1, 16, 16, 24), (1, 8, 8, 32), (1, 4, 4, 96),
                      (1, 2, 2, 320)]


@pytest.mark.parametrize("arch,last_ch", [("small", 576), ("large", 960)])
def test_mobilenet_v3(arch, last_ch):
    out_indices = (0, 1, 12) if arch == "small" else (1, 3, 16)
    _, _, outs = build_and_run(dict(type="MobileNetV3", arch=arch,
                                    out_indices=out_indices))
    # the dilated surgery keeps os=8/16 shallow: final layer keeps 1/8 for
    # small (stride fixes at layers 4,9)
    assert outs[-1].shape[-1] == last_ch
    assert outs[-1].shape[1] >= 8  # never reaches os=32


def test_icnet_three_branches():
    cfg = dict(
        type="ICNet",
        backbone_cfg=dict(type="ResNetV1c", depth=18,
                          norm_cfg=dict(type="BN", requires_grad=True)),
        layer_channels=(128, 512),
        light_branch_middle_channels=8,
        psp_out_channels=32,
        out_channels=(8, 16, 16),
        norm_cfg=dict(type="BN", requires_grad=True))
    _, _, outs = build_and_run(cfg)
    assert len(outs) == 3
    assert outs[0].shape == (1, 8, 8, 8)     # 1/8 light branch
    # ceil-mode stem maxpool: 32→16→9 (torch ceil semantics), layer2 → 5
    assert outs[1].shape == (1, 5, 5, 16)
    assert outs[2].shape == (1, 1, 1, 16)    # 0.5x → 2 → layer3/4 → 1


def test_unet():
    _, _, outs = build_and_run(dict(type="UNet", base_channels=4,
                                    num_stages=4))
    assert outs[-1].shape == (1, 64, 64, 4)  # finest decoder level
    assert len(outs) == 4


def test_cascade_encoder_decoder():
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    head = dict(type="FCNHead", in_channels=128, in_index=1, channels=16,
                num_convs=1, concat_input=False, num_classes=2,
                norm_cfg=dict(type="BN", requires_grad=True),
                loss_decode=dict(type="CrossEntropyLoss"))
    head2 = dict(head, in_channels=128 + 2)  # concat of prev logits
    cfg = dict(type="CascadeEncoderDecoder", num_stages=2,
               backbone=dict(type="ResNet", depth=18, num_stages=2,
                             strides=(1, 2), dilations=(1, 1),
                             out_indices=(0, 1),
                             norm_cfg=dict(type="BN", requires_grad=True)),
               decode_head=[head, head2],
               test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, gt, img_metas={}, rescale=False,
                           return_loss=True, train=True)
    (seg_logits, losses), _ = model.apply(
        variables, x, gt, img_metas={}, rescale=False, return_loss=True,
        train=True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert "decode_0.loss_ce" in losses and "decode.loss_ce" in losses
    out = model.apply(variables, x, method="encode_decode")
    assert out.shape == (1, 32, 32, 2)
