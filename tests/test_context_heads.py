"""DNLHead / APCHead / DMHead: torch-golden numerics (beyond-reference
context-head families).

Twins re-derive mmseg's DisentangledNonLocal2d (whitened pairwise +
temperature softmax + unary term), APCNet's ACM (GLA sigmoid affinity
over pooled regions) and DMNet's DCM (per-sample depthwise dynamic conv,
run in torch exactly as mmseg does — grouped conv with groups = N*C)
with the SAME weights pulled from the jax tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
from image_segmentation_lab_tpu.models.decode_heads.apc_head import ACM
from image_segmentation_lab_tpu.models.decode_heads.dm_head import (
    DCM, dynamic_depthwise_conv)
from image_segmentation_lab_tpu.models.decode_heads.dnl_head import \
    DisentangledNonLocal2d

from test_zoo_torch_parity import _t, randomize, tconv

torch.set_grad_enabled(False)


def _conv1x1(x, p, bias=True):
    return tconv(x, p["weight"],
                 bias=np.asarray(p["bias"]) if bias else None)


def _cmr(x, p, k=1, pad=0):
    """ConvModule with norm_cfg=None: conv + ReLU."""
    return TF.relu(tconv(x, p["conv"]["weight"], padding=pad,
                         bias=np.asarray(p["conv"]["bias"])))


# ---------------------------------------------------------------------------
# DNL
# ---------------------------------------------------------------------------


def t_dnl_block(params, x_nchw, temperature=0.05, use_scale=True):
    n, C, H, W = x_nchw.shape
    g = _conv1x1(x_nchw, params["g"]).flatten(2).transpose(1, 2)
    theta = _conv1x1(x_nchw, params["theta"]).flatten(2).transpose(1, 2)
    phi = _conv1x1(x_nchw, params["phi"]).flatten(2)
    theta = theta - theta.mean(dim=-2, keepdim=True)
    phi = phi - phi.mean(dim=-1, keepdim=True)
    ci = theta.shape[-1]
    pairwise = theta @ phi
    if use_scale:
        pairwise = pairwise / ci ** 0.5
    pairwise = TF.softmax(pairwise / temperature, dim=-1)
    y = pairwise @ g                                     # (n, L, ci)
    unary = _conv1x1(x_nchw, params["conv_mask"]).view(n, 1, -1)
    unary = TF.softmax(unary, dim=-1)
    un = unary @ g                                       # (n, 1, ci)
    y = (y.transpose(1, 2).reshape(n, ci, H, W)
         + un.transpose(1, 2).reshape(n, ci, 1, 1))
    return x_nchw + _conv1x1(y, params["conv_out"])


@pytest.mark.parametrize("use_scale", [True, False])
def test_dnl_block_matches_torch(rng, use_scale):
    m = DisentangledNonLocal2d(10, reduction=2, use_scale=use_scale,
                               temperature=0.05, zeros_init=False)
    x = rng.randn(2, 5, 7, 10).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=31)
    out = m.apply(variables, jnp.asarray(x))
    ref = t_dnl_block(variables["params"], _t(x.transpose(0, 3, 1, 2)),
                      use_scale=use_scale)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-4)


DNL_HEAD = dict(type="DNLHead", in_channels=12, in_index=0, channels=8,
                reduction=2, use_scale=True, temperature=0.05,
                dropout_ratio=0.0, num_classes=3, norm_cfg=None,
                loss_decode=dict(type="CrossEntropyLoss"))


def test_dnl_head_matches_torch(rng):
    head = build_module_from_cfg(DNL_HEAD, DECODEHEAD)
    x = rng.randn(2, 6, 8, 12).astype(np.float32)
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          [jnp.asarray(x)])
    variables = randomize(variables, seed=32)
    out = head.apply(variables, [jnp.asarray(x)])
    p = variables["params"]
    xt = _t(x.transpose(0, 3, 1, 2))
    h = _cmr(xt, p["convs_0"], pad=1)
    h = t_dnl_block(p["dnl_block"], h)
    h = _cmr(h, p["convs_1"], pad=1)
    h = _cmr(torch.cat([xt, h], dim=1), p["conv_cat"], pad=1)
    ref = _conv1x1(h, p["conv_seg"])
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# APCNet ACM
# ---------------------------------------------------------------------------


def t_acm(params, x_nchw, scale, fusion=True):
    pooled = TF.adaptive_avg_pool2d(x_nchw, scale)
    x = _cmr(x_nchw, params["input_redu_conv"])
    pooled = _cmr(pooled, params["pooled_redu_conv"])
    b, c, h, w = x.shape
    pooled = pooled.reshape(b, c, -1).transpose(1, 2)    # (b, s², c)
    glob = _cmr(TF.adaptive_avg_pool2d(x, 1), params["global_info"])
    aff = tconv(x + glob.expand_as(x), params["gla"]["weight"],
                bias=np.asarray(params["gla"]["bias"]))
    aff = torch.sigmoid(
        aff.permute(0, 2, 3, 1).reshape(b, h * w, scale * scale))
    z = (aff @ pooled).transpose(1, 2).reshape(b, c, h, w)
    z = _cmr(z, params["residual_conv"])
    z = TF.relu(z + x)
    if fusion:
        z = _cmr(z, params["fusion_conv"])
    return z


@pytest.mark.parametrize("scale,fusion", [(2, True), (3, False), (1, True)])
def test_acm_matches_torch(rng, scale, fusion):
    m = ACM(scale, fusion, 10, 6, act_cfg=dict(type="ReLU"))
    x = rng.randn(2, 7, 5, 10).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=41)
    out = m.apply(variables, jnp.asarray(x))
    ref = t_acm(variables["params"], _t(x.transpose(0, 3, 1, 2)),
                scale, fusion)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-4)


APC_HEAD = dict(type="APCHead", in_channels=12, in_index=0, channels=8,
                pool_scales=(1, 2, 3), fusion=True, dropout_ratio=0.0,
                num_classes=3, norm_cfg=None,
                loss_decode=dict(type="CrossEntropyLoss"))


def test_apc_head_matches_torch(rng):
    head = build_module_from_cfg(APC_HEAD, DECODEHEAD)
    x = rng.randn(2, 6, 9, 12).astype(np.float32)
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          [jnp.asarray(x)])
    variables = randomize(variables, seed=42)
    out = head.apply(variables, [jnp.asarray(x)])
    p = variables["params"]
    xt = _t(x.transpose(0, 3, 1, 2))
    outs = [xt] + [t_acm(p[f"acm_modules_{i}"], xt, s, fusion=True)
                   for i, s in enumerate((1, 2, 3))]
    h = _cmr(torch.cat(outs, dim=1), p["bottleneck"], pad=1)
    ref = _conv1x1(h, p["conv_seg"])
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# DMNet DCM
# ---------------------------------------------------------------------------


def t_dcm(params, x_nchw, k, fusion=False):
    filt = TF.adaptive_avg_pool2d(x_nchw, k)
    filt = _conv1x1(filt, params["filter_gen_conv"])
    x = _cmr(x_nchw, params["input_redu_conv"])
    b, c, h, w = x.shape
    xg = x.reshape(1, b * c, h, w)
    gf = filt.reshape(b * c, 1, k, k)
    pad = (k - 1) // 2
    p2d = ((pad,) * 4 if (k - 1) % 2 == 0
           else (pad + 1, pad, pad + 1, pad))
    xg = TF.pad(xg, p2d)
    out = TF.conv2d(xg, gf, groups=b * c).reshape(b, c, h, w)
    out = TF.relu(out)
    if fusion:
        out = _cmr(out, params["fusion_conv"])
    return out


@pytest.mark.parametrize("k,fusion", [(1, False), (3, False), (4, False),
                                      (5, True)])
def test_dcm_matches_torch(rng, k, fusion):
    m = DCM(k, fusion, 10, 6, act_cfg=dict(type="ReLU"))
    x = rng.randn(2, 6, 7, 10).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=51)
    out = m.apply(variables, jnp.asarray(x))
    ref = t_dcm(variables["params"], _t(x.transpose(0, 3, 1, 2)), k, fusion)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-4)


def test_dynamic_depthwise_even_kernel_padding():
    # Even k: left/top get pad+1 (mmseg DCM F.pad semantics).
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    filt = jnp.ones((2, 2, 2, 3), jnp.float32)
    out = dynamic_depthwise_conv(x, filt, 2)
    xt = _t(np.asarray(x).transpose(0, 3, 1, 2))
    gf = _t(np.asarray(filt).transpose(0, 3, 1, 2).reshape(6, 1, 2, 2))
    ref = TF.conv2d(TF.pad(xt.reshape(1, 6, 4, 4), (1, 0, 1, 0)),
                    gf, groups=6).reshape(2, 3, 4, 4)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-5)


DM_HEAD = dict(type="DMHead", in_channels=12, in_index=0, channels=8,
               filter_sizes=(1, 3), fusion=False, dropout_ratio=0.0,
               num_classes=3, norm_cfg=None,
               loss_decode=dict(type="CrossEntropyLoss"))


def test_dm_head_matches_torch(rng):
    head = build_module_from_cfg(DM_HEAD, DECODEHEAD)
    x = rng.randn(2, 6, 8, 12).astype(np.float32)
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          [jnp.asarray(x)])
    variables = randomize(variables, seed=52)
    out = head.apply(variables, [jnp.asarray(x)])
    p = variables["params"]
    xt = _t(x.transpose(0, 3, 1, 2))
    outs = [xt] + [t_dcm(p[f"dcm_modules_{i}"], xt, k)
                   for i, k in enumerate((1, 3))]
    h = _cmr(torch.cat(outs, dim=1), p["bottleneck"], pad=1)
    ref = _conv1x1(h, p["conv_seg"])
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-4)
