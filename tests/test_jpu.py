"""FastFCN JPU neck (beyond-reference): torch-golden fusion numerics +
contract + config."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import NECK
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import P, _t, assert_feature_parity, randomize, \
    tbn, tconv

torch.set_grad_enabled(False)


def _convbnrelu(x, p, s, path, pad=0, dilation=1, groups=1):
    h = tconv(x, P(p, path + "/conv/weight"), stride=1, padding=pad,
              dilation=dilation, groups=groups)
    return TF.relu(tbn(h, p, s, path + "/bn"))


def t_jpu(p, s, inputs, dilations=(1, 2, 4)):
    feats = [_convbnrelu(x, p, s, f"conv{i}", pad=1)
             for i, x in enumerate(inputs)]
    size = feats[0].shape[2:]
    feats = [feats[0]] + [
        TF.interpolate(f, size=size, mode="bilinear", align_corners=False)
        for f in feats[1:]
    ]
    feat = torch.cat(feats, 1)
    outs = []
    for d in dilations:
        dw_path = f"dilation{d}/depthwise_conv"
        h = tconv(feat, P(p, dw_path + "/conv/weight"), stride=1,
                  padding=d, dilation=d, groups=feat.shape[1])
        h = tbn(h, p, s, dw_path + "/bn")       # dw_act_cfg=None
        outs.append(_convbnrelu(h, p, s, f"dilation{d}/pointwise_conv"))
    return torch.cat(outs, 1)


def test_jpu_matches_torch(rng):
    m = build_module_from_cfg(
        dict(type="JPU", in_channels=(8, 16, 24), mid_channels=8,
             dilations=(1, 2, 4), norm_cfg=dict(type="BN")), NECK)
    xs = [rng.randn(1, 16, 16, 8).astype(np.float32),
          rng.randn(1, 8, 8, 16).astype(np.float32),
          rng.randn(1, 4, 4, 24).astype(np.float32)]
    jxs = [jnp.asarray(x) for x in xs]
    variables = m.init(jax.random.PRNGKey(0), jxs)
    variables = randomize(variables, seed=251)
    outs = m.apply(variables, jxs, mutable=False)
    # passthrough of all but the last level, fused map appended
    assert len(outs) == 3
    np.testing.assert_array_equal(np.asarray(outs[0]), xs[0])
    np.testing.assert_array_equal(np.asarray(outs[1]), xs[1])
    assert outs[2].shape == (1, 16, 16, 24)      # 3 dilations x mid 8
    ref = t_jpu(variables["params"], variables["batch_stats"],
                [_t(x.transpose(0, 3, 1, 2)) for x in xs])
    assert_feature_parity(outs[2], ref)


def test_fastfcn_config_builds():
    from image_segmentation_lab_tpu.core.fileio.parse import \
        parse_and_backup_config
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    cfg = parse_and_backup_config(
        "configs/network/fastfcn/fastfcn_r50_psp.py")
    model = cfg["model"]
    model["backbone"].update(depth=18, base_channels=8, stem_channels=8)
    model["neck"].update(in_channels=(16, 32, 64), mid_channels=8)
    model["decode_head"].update(in_channels=32, channels=16)
    model["auxiliary_head"].update(in_channels=32, channels=8)
    seg = build_segmentor(model)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = seg.init(jax.random.PRNGKey(0), x, method="encode_decode")
    out = seg.apply(variables, x, method="encode_decode", mutable=False)
    assert out.shape == (1, 64, 64, 2)
