"""Vision Transformer backbone + SETR-UP head: torch-golden numerics +
convention tests (beyond-reference family, models/backbones/vit.py,
models/decode_heads/setr_up_head.py).

The torch twin re-derives the ViT forward semantics from the paper
(Dosovitskiy et al., ICLR 2021; mmseg VisionTransformer conventions):
patchify conv, cls-token concat, learned position table resized
bicubically to the runtime grid, pre-norm MHSA/MLP blocks with exact
GELU, final LN, patch-token maps at the tapped indices — with the SAME
weights pulled from the jax variable tree, so what is under test is the
wiring and the pos-embed resampling.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE, DECODEHEAD
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import _t, assert_feature_parity, randomize, tconv
from test_swin import t_linear, t_ln

torch.set_grad_enabled(False)

TINY = dict(type="VisionTransformer", arch="tiny", embed_dims=16,
            num_layers=2, num_heads=2, patch_size=4, pretrain_img_size=16,
            out_indices=(0, 1), final_norm=True, drop_path_rate=0.0)


def t_mhsa(tokens, p, heads):
    B, L, C = tokens.shape
    d = C // heads
    qkv = t_linear(tokens, p["qkv"])
    q = qkv[..., :C].view(B, L, heads, d)
    k = qkv[..., C:2 * C].view(B, L, heads, d)
    v = qkv[..., 2 * C:].view(B, L, heads, d)
    scores = torch.einsum("blhd,bshd->bhls", q, k) / math.sqrt(d)
    out = torch.einsum("bhls,bshd->blhd", TF.softmax(scores, dim=-1), v)
    return t_linear(out.reshape(B, L, C), p["proj"])


def t_vit_block(x, p, heads):
    y = t_mhsa(t_ln(x, p["norm1"]), p["attn"], heads)
    x = x + y
    y = t_ln(x, p["norm2"])
    y = TF.gelu(t_linear(y, p["fc1"]))  # exact GELU
    return x + t_linear(y, p["fc2"])


def t_vit(params, x_nchw, cfg=TINY, with_cls=True):
    ps, grid = cfg["patch_size"], cfg["pretrain_img_size"] // cfg["patch_size"]
    C, heads = cfg["embed_dims"], cfg["num_heads"]
    x = tconv(x_nchw, params["patch_embed_proj"]["weight"], stride=ps,
              bias=np.asarray(params["patch_embed_proj"]["bias"]))
    N, _, gh, gw = x.shape
    tokens = x.flatten(2).transpose(1, 2)                 # (N, L, C)
    cls = _t(params["cls_token"]).expand(N, 1, C)
    tokens = torch.cat([cls, tokens], dim=1)
    pos = _t(params["pos_embed"])
    if (gh, gw) != (grid, grid):
        maps = pos[:, 1:].reshape(1, grid, grid, C).permute(0, 3, 1, 2)
        maps = TF.interpolate(maps, (gh, gw), mode="bicubic",
                              align_corners=False)
        pos = torch.cat([pos[:, :1],
                         maps.permute(0, 2, 3, 1).reshape(1, gh * gw, C)], 1)
    tokens = tokens + pos
    if not with_cls:
        tokens = tokens[:, 1:]
    lead = 1 if with_cls else 0
    outs = []
    for i in range(cfg["num_layers"]):
        tokens = t_vit_block(tokens, params[f"block{i}"], heads)
        if i == cfg["num_layers"] - 1 and cfg.get("final_norm"):
            tokens = t_ln(tokens, params["norm1"])
        if i in cfg["out_indices"]:
            outs.append(tokens[:, lead:].reshape(N, gh, gw, C)
                        .permute(0, 3, 1, 2))
    return outs


def _init(cfg, hw=(16, 16)):
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.zeros((1, *hw, 3))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    return m, v


def test_vit_matches_torch_reference_semantics(rng):
    m, variables = _init(TINY)
    variables = randomize(variables, seed=41)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    jax_outs = m.apply(variables, jnp.asarray(x))
    torch_outs = t_vit(variables["params"], _t(x.transpose(0, 3, 1, 2)))
    assert len(jax_outs) == len(torch_outs) == 2
    for j, t in zip(jax_outs, torch_outs):
        assert_feature_parity(j, t, rtol=5e-3, atol=5e-4)


def test_vit_pos_embed_interpolation_parity(rng):
    """A non-pretrain grid (24x28 -> 6x7 patches vs the stored 4x4) takes
    the bicubic resample path; the twin uses torch F.interpolate."""
    m, variables = _init(TINY, hw=(24, 28))
    variables = randomize(variables, seed=42)
    x = rng.randn(1, 24, 28, 3).astype(np.float32)
    jax_outs = m.apply(variables, jnp.asarray(x))
    torch_outs = t_vit(variables["params"], _t(x.transpose(0, 3, 1, 2)))
    for j, t in zip(jax_outs, torch_outs):
        assert_feature_parity(j, t, rtol=5e-3, atol=5e-4)


def test_vit_without_cls_token(rng):
    cfg = dict(TINY, with_cls_token=False)
    m, variables = _init(cfg)
    variables = randomize(variables, seed=43)
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    jax_outs = m.apply(variables, jnp.asarray(x))
    torch_outs = t_vit(variables["params"], _t(x.transpose(0, 3, 1, 2)),
                       cfg, with_cls=False)
    for j, t in zip(jax_outs, torch_outs):
        assert_feature_parity(j, t, rtol=5e-3, atol=5e-4)


def test_vit_remat_matches_plain(rng):
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    m1, v = _init(TINY)
    m2, _ = _init(dict(TINY, with_cp=True))
    o1 = m1.apply(v, jnp.asarray(x))
    o2 = m2.apply(v, jnp.asarray(x))
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_vit_frozen_stages_routes_collections():
    _, v = _init(dict(TINY, frozen_stages=1))
    frozen, trainable = v["frozen_params"], v["params"]
    for name in ("patch_embed_proj", "cls_token", "pos_embed", "block0"):
        assert name in frozen and name not in trainable, name
    for name in ("block1", "norm1"):
        assert name in trainable and name not in frozen, name


def test_vit_arch_table_and_bad_args():
    from image_segmentation_lab_tpu.models.backbones.vit import ARCH_TABLE
    assert ARCH_TABLE["base"] == dict(embed_dims=768, num_layers=12,
                                      num_heads=12)
    with pytest.raises(KeyError, match="unknown ViT arch"):
        _init(dict(type="VisionTransformer", arch="huge"))
    with pytest.raises(ValueError, match="frozen_stages"):
        _init(dict(TINY, frozen_stages=7))
    with pytest.raises(ValueError, match="interpolate_mode"):
        _init(dict(TINY, interpolate_mode="area"))


# ------------------------------------------------------------- SETR head
def test_setr_up_head_matches_torch(rng):
    """LN -> num_convs x [conv/BN/ReLU -> 2x bilinear] -> 1x1 cls conv."""
    from test_zoo_torch_parity import P, tbn

    cfg = dict(type="SETRUPHead", in_channels=12, in_index=0, channels=8,
               num_convs=2, up_scale=2, kernel_size=3, dropout_ratio=0.0,
               num_classes=3, align_corners=False,
               norm_cfg=dict(type="SyncBatchNorm", requires_grad=True),
               loss_decode=dict(type="CrossEntropyLoss"))
    head = build_module_from_cfg(cfg, DECODEHEAD)
    x = jnp.zeros((1, 7, 9, 12))
    v = head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, [x])
    v = randomize(v, seed=44)
    xin = rng.randn(2, 7, 9, 12).astype(np.float32)
    jax_out = head.apply(v, [jnp.asarray(xin)])

    params, stats = v["params"], v["batch_stats"]
    t = _t(xin.transpose(0, 3, 1, 2))
    t = t_ln(t.permute(0, 2, 3, 1), params["in_norm"]).permute(0, 3, 1, 2)
    for i in range(2):
        t = tconv(t, P(params, f"up_convs_{i}/conv/weight"), padding=1)
        t = tbn(t, params, stats, f"up_convs_{i}/bn")
        t = TF.relu(t)
        t = TF.interpolate(t, scale_factor=2.0, mode="bilinear",
                           align_corners=False)
    t = tconv(t, P(params, "conv_seg/weight"),
              bias=np.asarray(P(params, "conv_seg/bias")))
    assert_feature_parity(jax_out, t, rtol=5e-3, atol=5e-4)


def test_setr_up_head_bad_kernel():
    with pytest.raises(AssertionError, match="kernel_size"):
        cfg = dict(type="SETRUPHead", in_channels=4, in_index=0, channels=4,
                   kernel_size=2, num_classes=2,
                   loss_decode=dict(type="CrossEntropyLoss"))
        head = build_module_from_cfg(cfg, DECODEHEAD)
        head.init({"params": jax.random.PRNGKey(0)},
                  [jnp.zeros((1, 4, 4, 4))])
