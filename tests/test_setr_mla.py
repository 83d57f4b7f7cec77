"""MLANeck + SETRMLAHead: torch-golden numerics (SETR-MLA variant,
beyond-reference family).

Twins re-derive mmseg's MLANeck (per-level token LayerNorm, 1x1
projection, reversed cumulative aggregation, 3x3 refine) and
SETRMLAHead (per-level conv-conv-4x-upsample branches concatenated
before the classifier) with the SAME weights pulled from the jax tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD, NECK
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
from image_segmentation_lab_tpu.models.necks.mla_neck import MLANeck

from test_zoo_torch_parity import P, _t, randomize, tconv

torch.set_grad_enabled(False)


def _ln_tokens(x_nchw, p, eps=1e-6):
    n, c, h, w = x_nchw.shape
    t = x_nchw.flatten(2).transpose(1, 2)          # (n, L, c)
    t = TF.layer_norm(t, (c,), _t(p["weight"]), _t(p["bias"]), eps)
    return t.transpose(1, 2).reshape(n, c, h, w)


def _conv(x, p, pad=0):
    return tconv(x, p["conv"]["weight"], padding=pad,
                 bias=np.asarray(p["conv"]["bias"]))


def t_mla_neck(params, xs):
    feats = [_ln_tokens(x, params[f"norms_{i}"]) for i, x in enumerate(xs)]
    feats = [_conv(f, P(params, f"mla/channel_proj_{i}"))
             for i, f in enumerate(feats)]
    feats = feats[::-1]
    mids = []
    for f in feats:
        mids.append(f if not mids else mids[-1] + f)
    return [_conv(m, P(params, f"mla/feat_extract_{i}"), pad=1)
            for i, m in enumerate(mids)]


def test_mla_neck_matches_torch(rng):
    neck = build_module_from_cfg(
        dict(type="MLANeck", in_channels=[10, 10, 10], out_channels=6),
        NECK)
    xs = [rng.randn(2, 4, 5, 10).astype(np.float32) for _ in range(3)]
    jx = [jnp.asarray(x) for x in xs]
    variables = neck.init(jax.random.PRNGKey(0), jx)
    variables = randomize(variables, seed=111)
    outs = neck.apply(variables, jx)
    refs = t_mla_neck(variables["params"],
                      [_t(x.transpose(0, 3, 1, 2)) for x in xs])
    assert len(outs) == 3
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2),
                                   r.numpy(), atol=5e-5, rtol=1e-4)


MLA_HEAD = dict(type="SETRMLAHead", in_channels=[6, 6], in_index=(0, 1),
                input_transform="multiple_select", channels=8,
                mla_channels=4, up_scale=2, dropout_ratio=0.0,
                num_classes=3, norm_cfg=None, align_corners=False,
                loss_decode=dict(type="CrossEntropyLoss"))


def t_setr_mla_head(params, xs, up_scale=2):
    outs = []
    for i, x in enumerate(xs):
        h = TF.relu(_conv(x, P(params, f"up_convs_{i}_0"), pad=1))
        h = TF.relu(_conv(h, P(params, f"up_convs_{i}_1"), pad=1))
        h = TF.interpolate(h, scale_factor=up_scale, mode="bilinear",
                           align_corners=False)
        outs.append(h)
    out = torch.cat(outs, dim=1)
    return tconv(out, params["conv_seg"]["weight"],
                 bias=np.asarray(params["conv_seg"]["bias"]))


def test_setr_mla_head_matches_torch(rng):
    head = build_module_from_cfg(MLA_HEAD, DECODEHEAD)
    xs = [rng.randn(2, 4, 6, 6).astype(np.float32) for _ in range(2)]
    jx = [jnp.asarray(x) for x in xs]
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, jx)
    variables = randomize(variables, seed=112)
    out = head.apply(variables, jx)
    ref = t_setr_mla_head(variables["params"],
                          [_t(x.transpose(0, 3, 1, 2)) for x in xs])
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-4)


def test_setr_mla_head_channel_assert():
    import pytest
    bad = dict(MLA_HEAD, channels=7)
    head = build_module_from_cfg(bad, DECODEHEAD)
    with pytest.raises(AssertionError, match="mla_channels"):
        head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)},
                  [jnp.zeros((1, 4, 4, 6)), jnp.zeros((1, 4, 4, 6))])
