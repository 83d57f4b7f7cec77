"""Res2Net / ResNeSt: torch-golden numerics for the new bottlenecks
(beyond-reference backbone families).

Twins re-derive mmseg's Bottle2neck (multi-scale split hierarchy with
'stage'/'normal' accumulation and the strided pass-through pool) and
ResNeSt's SplitAttentionConv2d (grouped radix conv + rSoftmax gate,
avg_down_stride) with the SAME weights pulled from the jax tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.models.backbones.res2net import Bottle2neck
from image_segmentation_lab_tpu.models.backbones.resnest import (
    SplAtBottleneck, SplitAttentionConv2d)
from image_segmentation_lab_tpu.models.builder import (BACKBONE,
                                                       build_module_from_cfg)

from test_zoo_torch_parity import (P, _t, assert_feature_parity, randomize,
                                   tbn, tconv)

torch.set_grad_enabled(False)


# ---------------------------------------------------------------------------
# Res2Net Bottle2neck
# ---------------------------------------------------------------------------


def t_bottle2neck(params, stats, x, scales, width, stride=1, dilation=1,
                  avg_down=True, expansion_out=None):
    inplanes = x.shape[1]
    out = TF.relu(tbn(tconv(x, P(params, "conv1/weight")),
                      params, stats, "bn1"))
    has_down = stride != 1 or inplanes != expansion_out
    stage = has_down
    spx = torch.split(out, width, 1)
    sp = tconv(spx[0], P(params, "convs_0/weight"), stride=stride,
               padding=dilation, dilation=dilation)
    sp = TF.relu(tbn(sp, params, stats, "bns_0"))
    feats = [sp]
    for i in range(1, scales - 1):
        sp = spx[i] if stage else sp + spx[i]
        sp = tconv(sp, P(params, f"convs_{i}/weight"), stride=stride,
                   padding=dilation, dilation=dilation)
        sp = TF.relu(tbn(sp, params, stats, f"bns_{i}"))
        feats.append(sp)
    if not stage or stride == 1:
        feats.append(spx[scales - 1])
    else:
        feats.append(TF.avg_pool2d(spx[scales - 1], 3, stride, padding=1))
    out = torch.cat(feats, 1)
    out = tbn(tconv(out, P(params, "conv3/weight")), params, stats, "bn3")
    identity = x
    if has_down:
        if avg_down and stride != 1:
            identity = TF.avg_pool2d(identity, stride, stride,
                                     ceil_mode=True,
                                     count_include_pad=False)
        identity = tbn(tconv(identity, P(params, "downsample_conv/weight")),
                       params, stats, "downsample_bn")
    return TF.relu(out + identity)


@pytest.mark.parametrize("inplanes,planes,stride,expect_stage", [
    (64, 16, 1, False),   # inplanes == planes*4: plain 'normal' block
    (32, 16, 1, True),    # channel change at stride 1: 'stage' entry
    (64, 16, 2, True),    # strided 'stage' entry with pooled pass-through
])
def test_bottle2neck_matches_torch(rng, inplanes, planes, stride,
                                   expect_stage):
    m = Bottle2neck(inplanes=inplanes, planes=planes, stride=stride,
                    scales=4, base_width=26, base_channels=64,
                    avg_down=True)
    width = int(planes * 26 / 64)
    x = rng.randn(2, 8, 8, inplanes).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=61)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    # 'stage' entry blocks are exactly the ones owning a downsample branch
    assert ("downsample_conv" in variables["params"]) == expect_stage
    ref = t_bottle2neck(variables["params"], variables["batch_stats"],
                        _t(x.transpose(0, 3, 1, 2)), 4, width,
                        stride=stride, expansion_out=planes * 4)
    assert_feature_parity(out, ref)


def test_res2net_backbone_shapes(rng):
    cfg = dict(type="Res2Net", depth=50, scales=4, base_width=26,
               out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
               strides=(1, 2, 1, 1), contract_dilation=True)
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x, mutable=False)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 256), (1, 4, 4, 512), (1, 4, 4, 1024), (1, 4, 4, 2048)]
    # deep V1d stem: no 7x7 conv1, three 3x3 stem convs
    assert "stem_0" in variables["params"]


# ---------------------------------------------------------------------------
# ResNeSt split attention
# ---------------------------------------------------------------------------


def t_splat(params, stats, x, channels, radix, groups, stride=1, dilation=1):
    out = tconv(x, P(params, "conv/weight"), stride=stride, padding=dilation,
                dilation=dilation, groups=groups * radix)
    out = TF.relu(tbn(out, params, stats, "norm0"))
    batch = out.shape[0]
    if radix > 1:
        splits = out.view(batch, radix, -1, *out.shape[2:])
        gap = splits.sum(dim=1)
    else:
        gap = out
    gap = TF.adaptive_avg_pool2d(gap, 1)
    gap = tconv(gap, P(params, "fc1/weight"), groups=groups,
                bias=np.asarray(P(params, "fc1/bias")))
    gap = TF.relu(tbn(gap, params, stats, "norm1"))
    atten = tconv(gap, P(params, "fc2/weight"), groups=groups,
                  bias=np.asarray(P(params, "fc2/bias")))
    if radix > 1:
        a = atten.view(batch, groups, radix, -1).transpose(1, 2)
        a = TF.softmax(a, dim=1).reshape(batch, -1)
    else:
        a = torch.sigmoid(atten).view(batch, -1)
    a = a.view(batch, -1, 1, 1)
    if radix > 1:
        attens = a.view(batch, radix, -1, 1, 1)
        return (attens * splits).sum(dim=1)
    return a * out


@pytest.mark.parametrize("radix,groups,stride", [
    (2, 1, 1), (2, 2, 1), (4, 1, 1), (1, 1, 1), (2, 1, 2),
])
def test_split_attention_conv_matches_torch(rng, radix, groups, stride):
    m = SplitAttentionConv2d(8, 8, 3, stride=stride, padding=1,
                             groups=groups, radix=radix)
    x = rng.randn(2, 6, 6, 8).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=71)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    ref = t_splat(variables["params"], variables["batch_stats"],
                  _t(x.transpose(0, 3, 1, 2)), 8, radix, groups,
                  stride=stride)
    assert_feature_parity(out, ref)


def t_splat_bottleneck(params, stats, x, width, radix, groups, stride=1,
                       dilation=1, avd=True, expansion_out=None):
    inplanes = x.shape[1]
    out = TF.relu(tbn(tconv(x, P(params, "conv1/weight")),
                      params, stats, "bn1"))
    with_avd = avd and stride > 1
    out = t_splat(params["conv2"], stats["conv2"], out, width, radix, groups,
                  stride=1 if with_avd else stride, dilation=dilation)
    if with_avd:
        out = TF.avg_pool2d(out, 3, stride, padding=1)
    out = tbn(tconv(out, P(params, "conv3/weight")), params, stats, "bn3")
    identity = x
    if stride != 1 or inplanes != expansion_out:
        if stride != 1:  # avg_down=True in these tests
            identity = TF.avg_pool2d(identity, stride, stride,
                                     ceil_mode=True,
                                     count_include_pad=False)
        identity = tbn(tconv(identity, P(params, "downsample_conv/weight")),
                       params, stats, "downsample_bn")
    return TF.relu(out + identity)


@pytest.mark.parametrize("stride", [1, 2])
def test_splat_bottleneck_matches_torch(rng, stride):
    m = SplAtBottleneck(inplanes=32, planes=8, stride=stride, radix=2,
                        avg_down=True, avg_down_stride=True)
    x = rng.randn(2, 8, 8, 32).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=81)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    ref = t_splat_bottleneck(variables["params"], variables["batch_stats"],
                             _t(x.transpose(0, 3, 1, 2)), 8, 2, 1,
                             stride=stride, expansion_out=32)
    assert_feature_parity(out, ref)


# ---------------------------------------------------------------------------
# ResNeXt grouped bottleneck
# ---------------------------------------------------------------------------


def t_grouped_bottleneck(params, stats, x, groups, stride=1, dilation=1,
                         expansion_out=None):
    inplanes = x.shape[1]
    out = TF.relu(tbn(tconv(x, P(params, "conv1/weight")),
                      params, stats, "bn1"))
    out = tconv(out, P(params, "conv2/weight"), stride=stride,
                padding=dilation, dilation=dilation, groups=groups)
    out = TF.relu(tbn(out, params, stats, "bn2"))
    out = tbn(tconv(out, P(params, "conv3/weight")), params, stats, "bn3")
    identity = x
    if stride != 1 or inplanes != expansion_out:
        identity = tbn(tconv(identity, P(params, "downsample_conv/weight"),
                             stride=stride),
                       params, stats, "downsample_bn")
    return TF.relu(out + identity)


@pytest.mark.parametrize("groups,base_width,stride,dilation", [
    (4, 8, 1, 1),    # width (32*8//64)*4 = 16, residual block
    (4, 8, 2, 1),    # strided entry with downsample
    (8, 4, 1, 2),    # dilated grouped conv, width (32*4//64)*8 = 16
])
def test_resnext_bottleneck_matches_torch(rng, groups, base_width, stride,
                                          dilation):
    from image_segmentation_lab_tpu.models.backbones.resnet import Bottleneck
    m = Bottleneck(inplanes=128, planes=32, stride=stride, dilation=dilation,
                   groups=groups, base_width=base_width, base_channels=64)
    width = (32 * base_width // 64) * groups
    x = rng.randn(2, 8, 8, 128).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=91)
    # conv2 is grouped at the ResNeXt width: kernel (3,3,width/groups,width)
    assert variables["params"]["conv2"]["weight"].shape == (
        3, 3, width // groups, width)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    ref = t_grouped_bottleneck(variables["params"], variables["batch_stats"],
                               _t(x.transpose(0, 3, 1, 2)), groups,
                               stride=stride, dilation=dilation,
                               expansion_out=32 * 4)
    assert_feature_parity(out, ref)


def test_resnext_backbone_shapes_and_width(rng):
    cfg = dict(type="ResNeXt", depth=50, groups=32, base_width=4,
               out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
               strides=(1, 2, 1, 1), contract_dilation=True)
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x, mutable=False)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 256), (1, 4, 4, 512), (1, 4, 4, 1024), (1, 4, 4, 2048)]
    # 32x4d stage-1 width: floor(64*4/64)*32 = 128, grouped 3x3 in/groups=4
    blk0 = variables["params"]["layer1"]["blocks_0"]
    assert blk0["conv2"]["weight"].shape == (3, 3, 4, 128)
    # groups=1 keeps plain-ResNet widths (default-compat regression)
    m1 = build_module_from_cfg(dict(type="ResNeXt", depth=50, groups=1,
                                    out_indices=(3,)), BACKBONE)
    v1 = m1.init(jax.random.PRNGKey(0),
                 jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32)))
    assert v1["params"]["layer1"]["blocks_0"]["conv2"]["weight"].shape == (
        3, 3, 64, 64)


def test_resnest_backbone_shapes(rng):
    cfg = dict(type="ResNeSt", depth=50, radix=2, reduction_factor=4,
               avg_down_stride=True, out_indices=(0, 1, 2, 3),
               dilations=(1, 1, 2, 4), strides=(1, 2, 1, 1),
               contract_dilation=True)
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x, mutable=False)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 256), (1, 4, 4, 512), (1, 4, 4, 1024), (1, 4, 4, 2048)]
