"""MixVisionTransformer + SegFormerHead: torch-golden numerics and
framework-convention tests (beyond-reference SegFormer family).

The torch side re-derives the SegFormer forward semantics (Xie et al.,
NeurIPS 2021: overlapped patch embed -> pre-norm efficient attention with
stride-sr KV reduction -> Mix-FFN with depthwise positional conv) from the
paper, pulling the SAME weights from the jax variable tree — what is under
test is the wiring: head split order, sr conv + LN placement, residual/
pre-norm topology, patch-embed padding, scale-fuse-classify head.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE, DECODEHEAD
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import (P, _t, assert_feature_parity, randomize,
                                    tconv)

torch.set_grad_enabled(False)

TINY = dict(type="MixVisionTransformer", in_channels=3, embed_dims=8,
            num_stages=2, num_layers=(2, 1), num_heads=(1, 2),
            patch_sizes=(7, 3), strides=(4, 2), sr_ratios=(2, 1),
            out_indices=(0, 1), mlp_ratio=2, qkv_bias=True,
            drop_path_rate=0.0)


# ------------------------------------------------------- torch twin (tokens)
def t_ln(tokens, p, eps=1e-5):
    C = tokens.shape[-1]
    return TF.layer_norm(tokens, (C,), _t(p["weight"]), _t(p["bias"]), eps)


def t_lin(tokens, p):
    """1x1 conv == linear over channels: HWIO (1,1,Cin,Cout)."""
    w = _t(np.asarray(p["weight"])[0, 0])  # (Cin, Cout)
    out = tokens @ w
    if "bias" in p:
        out = out + _t(p["bias"])
    return out


def t_attn(tokens, p, hw, num_heads, sr_ratio):
    N, L, C = tokens.shape
    H, W = hw
    h, d = num_heads, C // num_heads
    q = t_lin(tokens, p["q"]).view(N, L, h, d)
    kv_in, s_hw = tokens, hw
    if sr_ratio > 1:
        xm = tokens.transpose(1, 2).reshape(N, C, H, W)
        xm = tconv(xm, p["sr"]["weight"], stride=sr_ratio,
                   bias=np.asarray(p["sr"]["bias"]))
        s_hw = xm.shape[2:]
        kv_in = xm.flatten(2).transpose(1, 2)
        kv_in = t_ln(kv_in, p["sr_norm"])
    S = s_hw[0] * s_hw[1]
    kv = t_lin(kv_in, p["kv"])
    k = kv[..., :C].view(N, S, h, d)
    v = kv[..., C:].view(N, S, h, d)
    scores = torch.einsum("nlhd,nshd->nhls", q, k) / math.sqrt(d)
    out = torch.einsum("nhls,nshd->nlhd", TF.softmax(scores, dim=-1), v)
    return t_lin(out.reshape(N, L, C), p["proj"])


def t_ffn(tokens, p, hw):
    N, L, C = tokens.shape
    H, W = hw
    x = t_lin(tokens, p["fc1"])
    Ch = x.shape[-1]
    xm = x.transpose(1, 2).reshape(N, Ch, H, W)
    xm = tconv(xm, p["pe_conv"]["weight"], padding=1, groups=Ch,
               bias=np.asarray(p["pe_conv"]["bias"]))
    x = xm.flatten(2).transpose(1, 2)
    x = TF.gelu(x)  # exact, matching torch nn.GELU default
    return t_lin(x, p["fc2"])


def t_mit(params, x_nchw, cfg=TINY):
    outs = []
    x = x_nchw
    for i in range(cfg["num_stages"]):
        ps, st = cfg["patch_sizes"][i], cfg["strides"][i]
        pe = params[f"patch_embed{i + 1}_proj"]
        x = tconv(x, pe["weight"], stride=st, padding=ps // 2,
                  bias=np.asarray(pe["bias"]))
        N, C, H, W = x.shape
        tokens = x.flatten(2).transpose(1, 2)  # (N, L, C)
        tokens = t_ln(tokens, params[f"patch_embed{i + 1}_norm"])
        for j in range(cfg["num_layers"][i]):
            b = params[f"stage{i + 1}_block{j + 1}"]
            tokens = tokens + t_attn(t_ln(tokens, b["norm1"]), b["attn"],
                                     (H, W), cfg["num_heads"][i],
                                     cfg["sr_ratios"][i])
            tokens = tokens + t_ffn(t_ln(tokens, b["norm2"]), b["ffn"],
                                    (H, W))
        tokens = t_ln(tokens, params[f"norm{i + 1}"])
        x = tokens.transpose(1, 2).reshape(N, C, H, W)
        if i in cfg["out_indices"]:
            outs.append(x)
    return outs


# ------------------------------------------------------------------- tests
def _init(cfg, shape=(1, 32, 32, 3)):
    model = build_module_from_cfg(dict(cfg), BACKBONE)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(shape), False)
    return model, variables


def test_mit_matches_torch_rederivation():
    model, variables = _init(TINY)
    variables = randomize(variables, seed=3)
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    jax_outs = model.apply(variables, jnp.asarray(x), False)
    torch_outs = t_mit(variables["params"], _t(x.transpose(0, 3, 1, 2)))
    assert len(jax_outs) == len(torch_outs) == 2
    assert jax_outs[0].shape == (2, 8, 8, 8)      # stride 4, C=8*1
    assert jax_outs[1].shape == (2, 4, 4, 16)     # stride 8, C=8*2
    for j, t in zip(jax_outs, torch_outs):
        assert_feature_parity(j, t)


def test_mit_remat_matches_plain():
    model, variables = _init(TINY)
    variables = randomize(variables, seed=5)
    model_cp = build_module_from_cfg(dict(TINY, with_cp=True), BACKBONE)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3),
                    jnp.float32)
    outs = model.apply(variables, x, False)
    outs_cp = model_cp.apply(variables, x, False)
    for a, b in zip(outs, outs_cp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mit_frozen_stages_routes_to_frozen_params():
    _, variables = _init(dict(TINY, frozen_stages=1))
    frozen = variables["frozen_params"]
    params = variables["params"]
    for name in ("patch_embed1_proj", "patch_embed1_norm", "stage1_block1",
                 "stage1_block2", "norm1"):
        assert name in frozen and name not in params, name
    for name in ("patch_embed2_proj", "stage2_block1", "norm2"):
        assert name in params and name not in frozen, name


def test_mit_bad_frozen_stages_raises():
    import pytest
    model = build_module_from_cfg(dict(TINY, frozen_stages=7), BACKBONE)
    with pytest.raises(ValueError, match="frozen_stages"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)


def test_segformer_head_matches_torch_rederivation():
    head_cfg = dict(type="SegFormerHead", in_channels=[8, 16],
                    in_index=(0, 1), input_transform="multiple_select",
                    channels=8, num_classes=3, dropout_ratio=0.0,
                    norm_cfg=dict(type="BN"), align_corners=False)
    head = build_module_from_cfg(head_cfg, DECODEHEAD)
    feats = [jnp.zeros((2, 16, 16, 8)), jnp.zeros((2, 8, 8, 16))]
    variables = head.init(jax.random.PRNGKey(0), feats, False)
    variables = randomize(variables, seed=11)
    rs = np.random.RandomState(2)
    xs = [rs.randn(2, 16, 16, 8).astype(np.float32),
          rs.randn(2, 8, 8, 16).astype(np.float32)]
    jax_out = head.apply(variables, [jnp.asarray(x) for x in xs], False)

    from test_zoo_torch_parity import t_conv_module
    params, stats = variables["params"], variables["batch_stats"]
    fused = []
    for i, x in enumerate(xs):
        t = t_conv_module(_t(x.transpose(0, 3, 1, 2)), params, stats,
                          f"scale_convs_{i}", k=1, act="relu")
        fused.append(TF.interpolate(t, size=(16, 16), mode="bilinear",
                                    align_corners=False))
    t = t_conv_module(torch.cat(fused, dim=1), params, stats,
                      "fusion_conv", k=1, act="relu")
    t = tconv(t, P(params, "conv_seg/weight"),
              bias=np.asarray(P(params, "conv_seg/bias")))
    assert jax_out.shape == (2, 16, 16, 3)
    assert_feature_parity(jax_out, t)
