"""PSAHead / psa_mask: golden numerics (beyond-reference PSANet family).

``np_psamask`` re-derives mmcv's PSAMask CUDA kernel as the literal
scatter loops from the reference C source (collect writes the attention
tap to the source-position output channel; distribute writes it to the
target spatial position) — an INDEPENDENT derivation of the gather-form
TPU implementation.  The head twin then mirrors mmseg's PSAHead forward
in torch (shrink resize, compact transpose asymmetry, channel softmax,
bmm aggregation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
from image_segmentation_lab_tpu.models.decode_heads.psa_head import psa_mask

from test_zoo_torch_parity import _t, randomize, tconv

torch.set_grad_enabled(False)


def np_psamask(inp, mask_size, psa_type):
    """Scatter-form PSAMask on (n, mask_h*mask_w, h, w) — the C loops."""
    n, M, h, w = inp.shape
    mask_h, mask_w = mask_size
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
    out = np.zeros((n, h * w, h, w), np.float32)
    for hh in range(h):
        for ww in range(w):
            hstart, hend = max(0, half_h - hh), min(mask_h, h + half_h - hh)
            wstart, wend = max(0, half_w - ww), min(mask_w, w + half_w - ww)
            for hidx in range(hstart, hend):
                for widx in range(wstart, wend):
                    v = inp[:, hidx * mask_w + widx, hh, ww]
                    if psa_type == "collect":
                        out[:, (hidx + hh - half_h) * w
                            + (widx + ww - half_w), hh, ww] = v
                    else:
                        out[:, hh * w + ww, hidx + hh - half_h,
                            widx + ww - half_w] = v
    return out


@pytest.mark.parametrize("psa_type", ["collect", "distribute"])
@pytest.mark.parametrize("hw,mask", [((4, 5), (7, 9)), ((4, 4), (3, 3)),
                                     ((3, 6), (5, 11))])
def test_psa_mask_matches_scatter_derivation(rng, psa_type, hw, mask):
    h, w = hw
    x = rng.randn(2, mask[0] * mask[1], h, w).astype(np.float32)
    ref = np_psamask(x, mask, psa_type)                # (n, L, h, w)
    out = psa_mask(jnp.asarray(x.transpose(0, 2, 3, 1)), mask, psa_type)
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=1e-6)


def _cmr(x, p, pad=0):
    return TF.relu(tconv(x, p["conv"]["weight"], padding=pad,
                         bias=np.asarray(p["conv"]["bias"])))


def t_attend(feat, p, mask_size, ptype, compact, compact_transpose,
             psa_softmax=True, norm_factor=1.0):
    n, c, h, w = feat.shape
    y = _cmr(feat, p[0])
    y = tconv(y, p[1]["weight"])
    if compact:
        if compact_transpose:
            y = y.reshape(n, h * w, h * w).transpose(1, 2) \
                 .reshape(n, h * w, h, w)
    else:
        y = torch.from_numpy(np_psamask(y.numpy(), mask_size, ptype))
    if psa_softmax:
        y = TF.softmax(y, dim=1)
    out = torch.bmm(feat.view(n, c, h * w), y.view(n, h * w, h * w))
    return out.view(n, c, h, w) * (1.0 / norm_factor)


def t_psa_head(params, x, mask_size, psa_type, shrink=1, compact=False,
               norm_factor=1.0):
    identity = x

    def shrink_fn(f):
        if shrink == 1:
            return f
        size = (f.shape[2] // shrink, f.shape[3] // shrink)  # even sizes
        return TF.interpolate(f, size=size, mode="bilinear",
                              align_corners=False)

    if psa_type in ("collect", "distribute"):
        out = shrink_fn(_cmr(x, params["reduce"]))
        out = t_attend(out, [params["attention_0"], params["attention_1"]],
                       mask_size, psa_type, compact,
                       psa_type == "collect", norm_factor=norm_factor)
    else:
        x_col = shrink_fn(_cmr(x, params["reduce"]))
        x_dis = shrink_fn(_cmr(x, params["reduce_p"]))
        x_col = t_attend(x_col,
                         [params["attention_0"], params["attention_1"]],
                         mask_size, "collect", compact, False,
                         norm_factor=norm_factor)
        x_dis = t_attend(x_dis,
                         [params["attention_p_0"], params["attention_p_1"]],
                         mask_size, "distribute", compact, True,
                         norm_factor=norm_factor)
        out = torch.cat([x_col, x_dis], dim=1)
    out = _cmr(out, params["proj"])
    out = TF.interpolate(out, size=identity.shape[2:], mode="bilinear",
                         align_corners=False)
    out = _cmr(torch.cat([identity, out], dim=1), params["bottleneck"],
               pad=1)
    return tconv(out, params["conv_seg"]["weight"],
                 bias=np.asarray(params["conv_seg"]["bias"]))


def _head_cfg(**over):
    cfg = dict(type="PSAHead", in_channels=10, in_index=0, channels=6,
               mask_size=(5, 5), psa_type="bi-direction", compact=False,
               shrink_factor=1, normalization_factor=1.0, psa_softmax=True,
               dropout_ratio=0.0, num_classes=3, norm_cfg=None,
               align_corners=False,
               loss_decode=dict(type="CrossEntropyLoss"))
    cfg.update(over)
    return cfg


@pytest.mark.parametrize("over", [
    dict(psa_type="collect"),
    dict(psa_type="distribute"),
    dict(psa_type="bi-direction"),
    dict(psa_type="bi-direction", shrink_factor=2),
    dict(psa_type="bi-direction", compact=True, mask_size=(6, 4)),
    dict(psa_type="collect", compact=True, mask_size=(6, 4)),
    dict(psa_type="collect", normalization_factor=25.0),
])
def test_psa_head_matches_torch(rng, over):
    cfg = _head_cfg(**over)
    head = build_module_from_cfg(cfg, DECODEHEAD)
    # feature 6x4 (after shrink 2: 3x2 — still even-divisible input 12x8)
    if cfg["shrink_factor"] == 2:
        x = rng.randn(2, 12, 8, 10).astype(np.float32)
    else:
        x = rng.randn(2, 6, 4, 10).astype(np.float32)
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          [jnp.asarray(x)])
    variables = randomize(variables, seed=91)
    out = head.apply(variables, [jnp.asarray(x)])
    ref = t_psa_head(variables["params"], _t(x.transpose(0, 3, 1, 2)),
                     cfg["mask_size"], cfg["psa_type"],
                     shrink=cfg["shrink_factor"], compact=cfg["compact"],
                     norm_factor=cfg["normalization_factor"])
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-4)
