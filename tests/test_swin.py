"""Swin Transformer backbone: torch-golden numerics + convention tests
(beyond-reference family, models/backbones/swin.py).

The torch twin re-derives the Swin forward semantics from the paper /
official implementation (Liu et al., ICCV 2021): patchify stem + LN,
pre-norm blocks of window-partitioned MSA with relative position bias and
the canonical rolled-frame 9-region shift mask, exact-GELU MLP, 2x2
patch-merging transitions, per-output LN.  The mask in the twin is built
with the official slice construction (img_mask on the rolled frame) —
independently of the backbone's group-label construction — so the test
pins both the attention math and the mask derivation.  Padding semantics
(non-divisible maps): this framework masks pad tokens out of attention
always (documented deliberate divergence from mmseg, which leaves pad
tokens attendable in unshifted windows); the twin implements the same
rule via an extra pad region id.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import _t, randomize, tconv

torch.set_grad_enabled(False)

TINY = dict(type="SwinTransformer", depths=(2, 2), embed_dims=8,
            num_heads=(2, 4), window_size=4, out_indices=(0, 1),
            drop_path_rate=0.0, patch_size=4)


def t_linear(x, p):
    out = x @ _t(p["weight"])
    if "bias" in p:
        out = out + _t(p["bias"])
    return out


def t_rel_pos_bias(p, ws, heads):
    """Official relative-position-bias derivation (independent of the
    backbone's numpy helper)."""
    coords = torch.stack(torch.meshgrid(torch.arange(ws), torch.arange(ws),
                                        indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    idx = rel.sum(-1)                                    # (ws², ws²)
    table = _t(p["relative_position_bias_table"])        # ((2ws-1)², h)
    bias = table[idx.view(-1)].view(ws * ws, ws * ws, heads)
    return bias.permute(2, 0, 1)                         # (h, ws², ws²)


def t_shift_mask(hp, wp, ws, shift, h_real, w_real):
    """Canonical rolled-frame slice construction (official Swin repo),
    plus a pad region id for this framework's pad-masking rule."""
    img = torch.zeros(hp, wp)
    if shift:
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wss in (slice(0, -ws), slice(-ws, -shift),
                        slice(-shift, None)):
                img[hs, wss] = cnt
                cnt += 1
    # pad positions, located in the ROLLED frame: rolled p came from
    # original (p + shift) mod hp
    pad_id = float(img.max()) + 1
    rows = (torch.arange(hp) + shift) % hp
    cols = (torch.arange(wp) + shift) % wp
    img[rows >= h_real, :] = pad_id
    img[:, cols >= w_real] = pad_id
    win = img.view(hp // ws, ws, wp // ws, ws).permute(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return torch.where(diff == 0, 0.0, -100.0)           # (nW, ws², ws²)


def t_window_msa(tokens, p, heads, ws, mask):
    """tokens: (B=N·nW, L=ws², C); mask (nW, L, L) or None."""
    B, L, C = tokens.shape
    d = C // heads
    qkv = t_linear(tokens, p["qkv"])
    q = qkv[..., :C].view(B, L, heads, d)
    k = qkv[..., C:2 * C].view(B, L, heads, d)
    v = qkv[..., 2 * C:].view(B, L, heads, d)
    scores = torch.einsum("blhd,bshd->bhls", q, k) / math.sqrt(d)
    scores = scores + t_rel_pos_bias(p, ws, heads)[None]
    if mask is not None:
        nW = mask.shape[0]
        scores = scores.view(B // nW, nW, heads, L, L) + mask[None, :, None]
        scores = scores.view(B, heads, L, L)
    out = torch.einsum("bhls,bshd->blhd", TF.softmax(scores, dim=-1), v)
    return t_linear(out.reshape(B, L, C), p["proj"])


def t_ln(x, p, eps=1e-5):
    return TF.layer_norm(x, (x.shape[-1],), _t(p["weight"]), _t(p["bias"]),
                         eps)


def t_swin_block(x_nhwc, p, heads, ws, shift):
    N, H, W, C = x_nhwc.shape
    # window size never shrinks (bias-table shape is resolution-
    # independent); sub-window maps pad up and shifting disables
    shift = shift if min(H, W) > ws else 0
    hp = -(-H // ws) * ws
    wp = -(-W // ws) * ws

    y = t_ln(x_nhwc, p["norm1"])
    # canonical order: pad to the window grid, THEN cyclic-shift
    y = TF.pad(y.permute(0, 3, 1, 2), (0, wp - W, 0, hp - H)) \
        .permute(0, 2, 3, 1)
    if shift:
        y = torch.roll(y, (-shift, -shift), dims=(1, 2))
    mask = None
    if shift or (hp, wp) != (H, W):
        mask = t_shift_mask(hp, wp, ws, shift, H, W)
    nwh, nww = hp // ws, wp // ws
    y = y.view(N, nwh, ws, nww, ws, C).permute(0, 1, 3, 2, 4, 5)
    y = y.reshape(N * nwh * nww, ws * ws, C)
    y = t_window_msa(y, p["attn"], heads, ws, mask)
    y = y.view(N, nwh, nww, ws, ws, C).permute(0, 1, 3, 2, 4, 5)
    y = y.reshape(N, hp, wp, C)
    if shift:
        y = torch.roll(y, (shift, shift), dims=(1, 2))
    y = y[:, :H, :W]
    x = x_nhwc + y

    y = t_ln(x, p["norm2"])
    y = t_linear(y, p["fc1"])
    y = TF.gelu(y)  # exact, matching torch nn.GELU default
    y = t_linear(y, p["fc2"])
    return x + y


def t_patch_merging(x_nhwc, p):
    N, H, W, C = x_nhwc.shape
    if H % 2 or W % 2:
        x_nhwc = TF.pad(x_nhwc.permute(0, 3, 1, 2),
                        (0, W % 2, 0, H % 2)).permute(0, 2, 3, 1)
        N, H, W, C = x_nhwc.shape
    x0 = x_nhwc[:, 0::2, 0::2]
    x1 = x_nhwc[:, 1::2, 0::2]
    x2 = x_nhwc[:, 0::2, 1::2]
    x3 = x_nhwc[:, 1::2, 1::2]
    y = torch.cat([x0, x1, x2, x3], dim=-1)
    y = t_ln(y, p["norm"])
    return y @ _t(p["reduction"]["weight"])


def t_swin(params, x_nchw, cfg=TINY):
    x = tconv(x_nchw, params["patch_embed_proj"]["weight"],
              stride=cfg["patch_size"],
              bias=np.asarray(params["patch_embed_proj"]["bias"]))
    x = x.permute(0, 2, 3, 1)
    x = t_ln(x, params["patch_embed_norm"])
    outs = []
    ws = cfg["window_size"]
    for i, depth in enumerate(cfg["depths"]):
        for j in range(depth):
            x = t_swin_block(x, params[f"stage{i}_block{j}"],
                             cfg["num_heads"][i], ws,
                             0 if j % 2 == 0 else ws // 2)
        if i in cfg["out_indices"]:
            outs.append(t_ln(x, params[f"norm{i}"]))
        if i < len(cfg["depths"]) - 1:
            x = t_patch_merging(x, params[f"downsample{i}"])
    return outs


def _init(cfg, hw=(56, 56)):
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.zeros((1, *hw, 3))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    return m, v


def test_swin_matches_torch_reference_semantics(rng):
    """56² input → 14² stem map with ws=4: every block pads 14→16 AND the
    odd blocks shift — the mask construction is exercised in full
    (9 shift regions + pad region), via the official slice-based twin."""
    m, variables = _init(TINY)
    variables = randomize(variables, seed=41)
    x = rng.randn(2, 56, 56, 3).astype(np.float32)
    jax_outs = m.apply(variables, jnp.asarray(x))
    torch_outs = t_swin(variables["params"], _t(x.transpose(0, 3, 1, 2)))
    assert len(jax_outs) == len(torch_outs) == 2
    for j, t in zip(jax_outs, torch_outs):  # the twin is NHWC end-to-end
        np.testing.assert_allclose(np.asarray(j), t.numpy(), rtol=5e-3,
                                   atol=5e-4)


def test_swin_divisible_input_matches_torch(rng):
    """64² input → 16² map: no padding, pure shift masks."""
    m, variables = _init(TINY, hw=(64, 64))
    variables = randomize(variables, seed=42)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    jax_outs = m.apply(variables, jnp.asarray(x))
    torch_outs = t_swin(variables["params"], _t(x.transpose(0, 3, 1, 2)))
    for j, t in zip(jax_outs, torch_outs):  # the twin is NHWC end-to-end
        np.testing.assert_allclose(np.asarray(j), t.numpy(), rtol=5e-3,
                                   atol=5e-4)


def test_swin_remat_matches_plain(rng):
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    m1, v = _init(TINY, hw=(32, 32))
    m2, _ = _init(dict(TINY, with_cp=True), hw=(32, 32))
    o1 = m1.apply(v, jnp.asarray(x))
    o2 = m2.apply(v, jnp.asarray(x))
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_swin_frozen_stages_routes_collections():
    _, v = _init(dict(TINY, frozen_stages=1))
    frozen, trainable = v["frozen_params"], v["params"]
    for name in ("patch_embed_proj", "patch_embed_norm", "stage0_block0",
                 "norm0"):
        assert name in frozen and name not in trainable, name
    for name in ("downsample0", "stage1_block0", "norm1"):
        assert name in trainable and name not in frozen, name


def test_swin_arch_table_and_bad_args():
    from image_segmentation_lab_tpu.models.backbones.swin import ARCH_TABLE
    assert ARCH_TABLE["tiny"]["depths"] == (2, 2, 6, 2)
    with pytest.raises(KeyError, match="unknown Swin arch"):
        _init(dict(type="SwinTransformer", arch="huge", out_indices=(0,)))
    with pytest.raises(ValueError, match="frozen_stages"):
        _init(dict(TINY, frozen_stages=7))


def test_swin_params_are_resolution_independent(rng):
    """The bias-table shape must not depend on input size: init at a tiny
    resolution (stage maps smaller than one window), apply at a larger one
    — the regression behind a 640² bench step failing against a 64²-inited
    state.  The sub-window path (pad-to-one-window, shift disabled) must
    also match the twin."""
    m, variables = _init(TINY, hw=(32, 32))   # stage-1 map 4x4 = ws
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    outs = m.apply(variables, jnp.asarray(x))  # larger maps, same params
    assert outs[-1].shape == (1, 8, 8, 16)

    variables = randomize(variables, seed=43)
    # 24² input: 6x6 map at stage 0 (shift active), 3x3 at stage 1 —
    # smaller than one 4x4 window, so stage 1 pads up with shift disabled
    xs = rng.randn(1, 24, 24, 3).astype(np.float32)
    j = m.apply(variables, jnp.asarray(xs))
    t = t_swin(variables["params"], _t(xs.transpose(0, 3, 1, 2)))
    for a, b in zip(j, t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=5e-3,
                                   atol=5e-4)
