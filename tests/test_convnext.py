"""ConvNeXt backbone: torch-golden numerics + framework-convention tests
(beyond-reference family, models/backbones/convnext.py).

The torch side re-derives the ConvNeXt forward semantics (Liu et al.,
CVPR 2022: 4x4/s4 patchify stem + LN, blocks of dw7x7 -> channels-last LN
-> 4x pointwise -> exact GELU -> pointwise -> layer scale -> residual,
LN + 2x2/s2 stage transitions, per-output LN) from the paper, pulling the
SAME weights from the jax variable tree — under test is the wiring:
stem/transition op order, depthwise grouping, layer-scale placement,
residual topology, out-norm application.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import (_t, assert_feature_parity, randomize,
                                   tconv)

torch.set_grad_enabled(False)

TINY = dict(type="ConvNeXt", depths=(2, 2, 2, 2), dims=(8, 16, 24, 32),
            out_indices=(0, 1, 2, 3), drop_path_rate=0.0)


def t_ln_nhwc(x_nchw, p, eps=1e-5):
    y = x_nchw.permute(0, 2, 3, 1)
    y = TF.layer_norm(y, (y.shape[-1],), _t(p["weight"]), _t(p["bias"]), eps)
    return y.permute(0, 3, 1, 2)


def t_pw(x_nchw, p):
    """1x1 conv == linear over channels."""
    y = x_nchw.permute(0, 2, 3, 1)
    y = y @ _t(np.asarray(p["weight"])[0, 0]) + _t(p["bias"])
    return y.permute(0, 3, 1, 2)


def t_block(x, p, dim):
    y = tconv(x, p["dwconv"]["weight"], padding=3, groups=dim,
              bias=np.asarray(p["dwconv"]["bias"]))
    y = t_ln_nhwc(y, p["norm"])
    y = t_pw(y, p["pwconv1"])
    y = TF.gelu(y)  # exact, matching torch nn.GELU default
    y = t_pw(y, p["pwconv2"])
    if "gamma" in p:
        y = y * _t(p["gamma"])[None, :, None, None]
    return x + y


def t_convnext(params, x_nchw, cfg=TINY):
    outs = []
    x = x_nchw
    for i, (depth, dim) in enumerate(zip(cfg["depths"], cfg["dims"])):
        if i == 0:
            x = tconv(x, params["stem_conv"]["weight"], stride=4,
                      bias=np.asarray(params["stem_conv"]["bias"]))
            x = t_ln_nhwc(x, params["stem_norm"])
        else:
            x = t_ln_nhwc(x, params[f"downsample{i}_norm"])
            x = tconv(x, params[f"downsample{i}_conv"]["weight"], stride=2,
                      bias=np.asarray(params[f"downsample{i}_conv"]["bias"]))
        for j in range(depth):
            x = t_block(x, params[f"stage{i}_block{j}"], dim)
        if i in cfg["out_indices"]:
            outs.append(t_ln_nhwc(x, params[f"norm{i}"]))
    return outs


def _init(cfg, hw=(64, 64)):
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.zeros((1, *hw, 3))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    return m, v


def test_convnext_matches_torch_reference_semantics(rng):
    m, variables = _init(TINY)
    variables = randomize(variables, seed=31)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    jax_outs = m.apply(variables, jnp.asarray(x))
    torch_outs = t_convnext(variables["params"],
                            _t(x.transpose(0, 3, 1, 2)))
    assert len(jax_outs) == len(torch_outs) == 4
    for j, t in zip(jax_outs, torch_outs):
        assert_feature_parity(j, t, rtol=5e-3, atol=5e-4)


def test_convnext_layer_scale_disabled_drops_gamma(rng):
    m, variables = _init(dict(TINY, layer_scale_init_value=0.0))
    assert "gamma" not in variables["params"]["stage0_block0"]
    # and the forward still matches the twin (no-gamma branch)
    variables = randomize(variables, seed=32)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    jax_outs = m.apply(variables, jnp.asarray(x))
    torch_outs = t_convnext(variables["params"], _t(x.transpose(0, 3, 1, 2)),
                            dict(TINY, hw=(32, 32)))
    assert_feature_parity(jax_outs[-1], torch_outs[-1], rtol=5e-3,
                          atol=5e-4)


def test_convnext_remat_matches_plain(rng):
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    m1, v = _init(TINY, hw=(32, 32))
    m2, _ = _init(dict(TINY, with_cp=True), hw=(32, 32))
    o1 = m1.apply(v, jnp.asarray(x))
    o2 = m2.apply(v, jnp.asarray(x))
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_convnext_frozen_stages_routes_collections():
    _, v = _init(dict(TINY, frozen_stages=2))
    frozen, trainable = v["frozen_params"], v["params"]
    for name in ("stem_conv", "stage0_block0", "downsample1_conv",
                 "stage1_block1", "norm0", "norm1"):
        assert name in frozen and name not in trainable, name
    for name in ("downsample2_conv", "stage2_block0", "stage3_block1",
                 "norm2", "norm3"):
        assert name in trainable and name not in frozen, name


def test_convnext_arch_table_and_bad_args():
    from image_segmentation_lab_tpu.models.backbones.convnext import \
        ARCH_TABLE
    assert ARCH_TABLE["tiny"]["depths"] == (3, 3, 9, 3)
    with pytest.raises(KeyError, match="unknown ConvNeXt arch"):
        _init(dict(TINY, type="ConvNeXt", depths=None, dims=None,
                   arch="huge"))
    with pytest.raises(ValueError, match="frozen_stages"):
        _init(dict(TINY, frozen_stages=9))
