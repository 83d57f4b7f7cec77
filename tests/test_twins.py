"""Twins (PCPVT / SVT): torch-golden numerics for the LSA window
attention and PEG, plus backbone contracts (beyond-reference families).

The LSA twin follows mmseg's ``LocallyGroupedSelfAttention`` forward
literally (token reshape, pad, group transpose, pad-indicator mask,
per-group attention); GSA reuses ``mit.EfficientMultiheadAttention``,
already torch-golden in tests/test_mit.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.backbones.twins import (
    ConditionalPositionEncoding, LocallyGroupedSelfAttention)
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import _t, randomize, tconv

torch.set_grad_enabled(False)


def t_lsa(params, x_nchw, ws, heads):
    b, c, h, w = x_nchw.shape
    d = c // heads
    x = x_nchw.permute(0, 2, 3, 1)                     # (b, h, w, c)
    pad_r = (ws - w % ws) % ws
    pad_b = (ws - h % ws) % ws
    x = TF.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    _h, _w = h + pad_b, w + pad_r
    nh, nw = _h // ws, _w // ws
    x = x.reshape(b, nh, ws, nw, ws, c).transpose(2, 3)

    mask = torch.zeros((1, _h, _w))
    if pad_b > 0:
        mask[:, -pad_b:, :] = 1
    if pad_r > 0:
        mask[:, :, -pad_r:] = 1
    mask = mask.reshape(1, nh, ws, nw, ws).transpose(2, 3) \
               .reshape(1, nh * nw, ws * ws)
    attn_mask = mask.unsqueeze(2) - mask.unsqueeze(3)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -1000.0)

    wq = _t(params["qkv"]["weight"])                  # (c, 3c)
    bq = _t(params["qkv"]["bias"])
    qkv = (x.reshape(b, nh * nw, ws * ws, c) @ wq + bq) \
        .reshape(b, nh * nw, ws * ws, 3, heads, d).permute(3, 0, 1, 4, 2, 5)
    q, k, v = qkv[0], qkv[1], qkv[2]                  # (b, G, h, P, d)
    attn = (q @ k.transpose(-2, -1)) * (d ** -0.5)
    attn = attn + attn_mask.unsqueeze(2)
    attn = TF.softmax(attn, dim=-1)
    out = (attn @ v).transpose(2, 3).reshape(b, nh, nw, ws, ws, c)
    out = out.transpose(2, 3).reshape(b, _h, _w, c)[:, :h, :w]
    out = out @ _t(params["proj"]["weight"]) + _t(params["proj"]["bias"])
    return out.permute(0, 3, 1, 2)


@pytest.mark.parametrize("hw,ws", [((6, 6), 3), ((7, 5), 3), ((4, 9), 4)])
def test_lsa_matches_torch(rng, hw, ws):
    m = LocallyGroupedSelfAttention(8, 2, window_size=ws)
    x = rng.randn(2, *hw, 8).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=161)
    out = m.apply(variables, jnp.asarray(x))
    ref = t_lsa(variables["params"], _t(x.transpose(0, 3, 1, 2)), ws, 2)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-4)


def test_peg_matches_torch(rng):
    m = ConditionalPositionEncoding(6)
    x = rng.randn(2, 5, 7, 6).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=162)
    out = m.apply(variables, jnp.asarray(x))
    xt = _t(x.transpose(0, 3, 1, 2))
    ref = tconv(xt, variables["params"]["proj"]["weight"], padding=1,
                groups=6,
                bias=np.asarray(variables["params"]["proj"]["bias"])) + xt
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("cfg,dims", [
    (dict(type="PCPVT", arch="pcpvt-small"), (64, 128, 320, 512)),
    (dict(type="SVT", arch="svt-small"), (64, 128, 256, 512)),
])
def test_twins_backbone_contract(rng, cfg, dims):
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x)
    outs = m.apply(variables, x, mutable=False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, dims[0]), (1, 8, 8, dims[1]),
        (1, 4, 4, dims[2]), (1, 2, 2, dims[3])]
    # PEG params exist per stage; SVT has window-attention qkv Linears
    assert "peg0" in variables["params"]
    if cfg["type"] == "SVT":
        assert "qkv" in variables["params"]["stage0_block0"]["attn"]
