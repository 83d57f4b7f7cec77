"""BiSeNetV2 backbone: torch-golden numerics + convention tests
(beyond-reference family, models/backbones/bisenetv2.py).

The torch twin re-derives the bilateral forward semantics from the
paper (Yu et al., IJCV 2021): detail conv stages, stem with conv/pool
branches, gather-expansion layers (stride-1 and stride-2 variants with
their depthwise expansions and shortcuts), global context embedding,
and the two-scale sigmoid-gated bilateral aggregation — with the SAME
weights pulled from the jax variable tree, so what is under test is
the wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import (P, _t, assert_feature_parity, randomize,
                                   tbn, tconv)

torch.set_grad_enabled(False)

SMALL = dict(type="BiSeNetV2", detail_channels=(8, 8, 16),
             semantic_channels=(4, 4, 8, 16), semantic_expansion_ratio=2,
             bga_channels=16)


def cbr(x, ps, st, prefix, k=3, stride=1, groups=1, relu=True):
    x = tconv(x, P(ps, prefix + "/conv/weight"), stride=stride,
              padding=k // 2, groups=groups)
    x = tbn(x, ps, st, prefix + "/bn")
    return TF.relu(x) if relu else x


def t_detail(ps, st, x, chs=(8, 8, 16)):
    for i in range(3):
        n = 1 if i == 0 else 2
        x = cbr(x, ps, st, f"detail/stage{i}_conv0", stride=2)
        for j in range(n):
            x = cbr(x, ps, st, f"detail/stage{i}_conv{j + 1}")
    return x


def t_stem(ps, st, x):
    x = cbr(x, ps, st, "semantic/stem/conv_first", stride=2)
    a = cbr(x, ps, st, "semantic/stem/convs_0", k=1)
    a = cbr(a, ps, st, "semantic/stem/convs_1", stride=2)
    b = torch.nn.MaxPool2d(3, 2, 1)(x)
    return cbr(torch.cat([a, b], dim=1), ps, st, "semantic/stem/fuse_last")


def t_ge(ps, st, x, prefix, cin, cout, e, stride):
    idn = x
    y = cbr(x, ps, st, f"{prefix}/conv1")
    if stride == 1:
        y = cbr(y, ps, st, f"{prefix}/dwconv_0", groups=cin, relu=False)
    else:
        y = cbr(y, ps, st, f"{prefix}/dwconv_0", groups=cin, stride=2,
                relu=False)
        y = cbr(y, ps, st, f"{prefix}/dwconv_1", groups=cin * e, relu=False)
    y = cbr(y, ps, st, f"{prefix}/conv2", k=1, relu=False)
    if stride != 1 or cin != cout:
        s = cbr(idn, ps, st, f"{prefix}/shortcut_dw", groups=cin,
                stride=stride, relu=False)
        idn = cbr(s, ps, st, f"{prefix}/shortcut_pw", k=1, relu=False)
    return TF.relu(y + idn)


def t_ce(ps, st, x, prefix="semantic/ce"):
    y = x.mean(dim=(2, 3), keepdim=True)
    y = tbn(y, ps, st, f"{prefix}/gap_norm")
    y = cbr(y, ps, st, f"{prefix}/conv_gap", k=1)
    return cbr(x + y, ps, st, f"{prefix}/conv_last")


def t_bga(ps, st, x_d, x_s):
    d_hi = cbr(x_d, ps, st, "bga/detail_dwconv", groups=x_d.shape[1],
               relu=False)
    d_hi = tconv(d_hi, P(ps, "bga/detail_dwconv_pw/weight"),
                 bias=np.asarray(P(ps, "bga/detail_dwconv_pw/bias")))
    d_lo = cbr(x_d, ps, st, "bga/detail_down", stride=2, relu=False)
    d_lo = torch.nn.AvgPool2d(3, 2, 1)(d_lo)
    s_hi = cbr(x_s, ps, st, "bga/semantic_conv", relu=False)
    s_hi = TF.interpolate(s_hi, size=x_d.shape[2:], mode="bilinear",
                          align_corners=False)
    s_lo = cbr(x_s, ps, st, "bga/semantic_dwconv", groups=x_s.shape[1],
               relu=False)
    s_lo = tconv(s_lo, P(ps, "bga/semantic_dwconv_pw/weight"),
                 bias=np.asarray(P(ps, "bga/semantic_dwconv_pw/bias")))
    f = d_hi * torch.sigmoid(s_hi) \
        + TF.interpolate(d_lo * torch.sigmoid(s_lo), size=x_d.shape[2:],
                         mode="bilinear", align_corners=False)
    return cbr(f, ps, st, "bga/conv")


def t_bisenetv2(variables, x, cfg=SMALL):
    ps, st = variables["params"], variables["batch_stats"]
    chs = cfg["semantic_channels"]
    e = cfg["semantic_expansion_ratio"]
    x_d = t_detail(ps, st, x, cfg["detail_channels"])
    s = t_stem(ps, st, x)
    outs = [s]
    for i in range(1, len(chs)):
        n = 4 if i == len(chs) - 1 else 2
        s = t_ge(ps, st, s, f"semantic/stage{i}_ge0", chs[i - 1], chs[i],
                 e, 2)
        for j in range(1, n):
            s = t_ge(ps, st, s, f"semantic/stage{i}_ge{j}", chs[i], chs[i],
                     e, 1)
        outs.append(s)
    ce = t_ce(ps, st, s)
    fused = t_bga(ps, st, x_d, ce)
    return [fused] + outs


def _init(cfg=SMALL, hw=(64, 64)):
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.zeros((1, *hw, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    return m, v


def test_bisenetv2_matches_torch_reference_semantics(rng):
    m, variables = _init()
    variables = randomize(variables, seed=61)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    jax_outs = m.apply(variables, jnp.asarray(x))
    torch_outs = t_bisenetv2(variables, _t(x.transpose(0, 3, 1, 2)))
    assert len(jax_outs) == len(torch_outs) == 5
    for j, t in zip(jax_outs, torch_outs):
        assert_feature_parity(j, t, rtol=5e-3, atol=5e-4)


def test_bisenetv2_odd_input_sizes(rng):
    """Pool/stride parity on non-divisible maps (floor-mode pooling)."""
    m, variables = _init(hw=(50, 42))
    variables = randomize(variables, seed=62)
    x = rng.randn(1, 50, 42, 3).astype(np.float32)
    jax_outs = m.apply(variables, jnp.asarray(x))
    torch_outs = t_bisenetv2(variables, _t(x.transpose(0, 3, 1, 2)))
    for j, t in zip(jax_outs, torch_outs):
        assert_feature_parity(j, t, rtol=5e-3, atol=5e-4)


def test_bisenetv2_out_indices_and_bad_widths():
    m, v = _init(dict(SMALL, out_indices=(0,)))
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 8, 8, 16)
    with pytest.raises(AssertionError, match="branch widths"):
        _init(dict(SMALL, bga_channels=32))
