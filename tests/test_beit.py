"""BEiT (beyond-reference): torch-golden block numerics (rel-pos bias,
q/v-only bias, layer scale), pos-bias table resampling, Feature2Pyramid
golden, UPerNet config."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.models.backbones.beit import (
    BEiTBlock, relative_position_index)
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
from image_segmentation_lab_tpu.core.registry_hub import BACKBONE, NECK

from test_zoo_torch_parity import P, _t, randomize, tbn

torch.set_grad_enabled(False)


def upstream_relative_position_index(Wh, Ww):
    """Independent derivation: the upstream BEiT buffer construction."""
    coords = torch.stack(torch.meshgrid(torch.arange(Wh), torch.arange(Ww),
                                        indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += Wh - 1
    rel[:, :, 1] += Ww - 1
    rel[:, :, 0] *= 2 * Ww - 1
    num_rel = (2 * Wh - 1) * (2 * Ww - 1) + 3
    idx = torch.zeros((Wh * Ww + 1, Wh * Ww + 1), dtype=torch.long)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


def test_relative_position_index_matches_upstream():
    for gh, gw in ((4, 4), (3, 5)):
        got = relative_position_index(gh, gw)
        want = upstream_relative_position_index(gh, gw).numpy()
        np.testing.assert_array_equal(got, want)


def _tlin(x, p, path, bias=True):
    w = torch.from_numpy(np.asarray(P(p, path + "/weight")))
    b = torch.from_numpy(np.asarray(P(p, path + "/bias"))) if bias else None
    return TF.linear(x, w.t(), b)


def _tln(x, p, path):
    w = torch.from_numpy(np.asarray(P(p, path + "/weight")))
    b = torch.from_numpy(np.asarray(P(p, path + "/bias")))
    return TF.layer_norm(x, w.shape, w, b, eps=1e-5)


def t_beit_block(p, x, heads, grid):
    N, L1, C = x.shape
    d = C // heads
    ap = p["attn"]
    y = _tln(x, p, "norm1")
    qkv = _tlin(y, ap, "qkv", bias=False)
    q_bias = torch.from_numpy(np.asarray(ap["q_bias"]))
    v_bias = torch.from_numpy(np.asarray(ap["v_bias"]))
    qkv = qkv + torch.cat([q_bias, torch.zeros_like(q_bias), v_bias])
    q, k, v = [t.reshape(N, L1, heads, d).permute(0, 2, 1, 3)
               for t in qkv.chunk(3, dim=-1)]
    table = torch.from_numpy(
        np.asarray(ap["relative_position_bias_table"]))
    idx = upstream_relative_position_index(grid, grid)
    bias = table[idx.view(-1)].view(L1, L1, heads).permute(2, 0, 1)
    attn = (q @ k.transpose(-2, -1)) / math.sqrt(d) + bias.unsqueeze(0)
    attn = attn.softmax(dim=-1)
    y = (attn @ v).permute(0, 2, 1, 3).reshape(N, L1, C)
    y = _tlin(y, ap, "proj")
    g1 = torch.from_numpy(np.asarray(p["gamma_1"]))
    g2 = torch.from_numpy(np.asarray(p["gamma_2"]))
    x = x + g1 * y
    y = _tln(x, p, "norm2")
    y = _tlin(TF.gelu(_tlin(y, p, "fc1")), p, "fc2")
    return x + g2 * y


def test_beit_block_matches_torch(rng):
    grid, C, heads = 4, 16, 2
    m = BEiTBlock(C, heads, grid)
    x = rng.randn(2, grid * grid + 1, C).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=221)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    ref = t_beit_block(variables["params"], torch.from_numpy(x), heads, grid)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_beit_full_backbone_matches_torch(rng):
    """Full wiring at the pretraining grid (no table resample): patch
    embed + cls token + blocks + final norm + taps."""
    from test_zoo_torch_parity import tconv
    grid, C, heads = 4, 16, 2
    m = build_module_from_cfg(
        dict(type="BEiT", embed_dims=C, num_layers=2, num_heads=heads,
             patch_size=8, pretrain_img_size=32, out_indices=(0, 1),
             final_norm=True), BACKBONE)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=223)
    o0, o1 = m.apply(variables, jnp.asarray(x), mutable=False)
    p = variables["params"]
    h = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)),
              P(p, "patch_embed_proj/weight"), stride=8,
              bias=np.asarray(P(p, "patch_embed_proj/bias")))
    toks = h.flatten(2).transpose(1, 2)                 # (1, 16, C)
    cls = torch.from_numpy(np.asarray(P(p, "cls_token")))
    toks = torch.cat([cls.expand(1, 1, C), toks], dim=1)
    toks = t_beit_block(p["block0"], toks, heads, grid)
    ref0 = toks[:, 1:].reshape(1, grid, grid, C)
    toks = t_beit_block(p["block1"], toks, heads, grid)
    toks = _tln(toks, p, "norm1")
    ref1 = toks[:, 1:].reshape(1, grid, grid, C)
    np.testing.assert_allclose(np.asarray(o0), ref0.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(o1), ref1.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_beit_backbone_contract_and_table_resample(rng):
    m = build_module_from_cfg(
        dict(type="BEiT", embed_dims=16, num_layers=4, num_heads=2,
             patch_size=8, pretrain_img_size=32, out_indices=(1, 3)),
        BACKBONE)
    # runtime grid (6x6) != pretraining grid (4x4): table resampled
    x = jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    o1, o3 = m.apply(variables, x, mutable=False)
    assert o1.shape == (1, 6, 6, 16) and o3.shape == (1, 6, 6, 16)
    tab = variables["params"]["block0"]["attn"][
        "relative_position_bias_table"]
    assert tab.shape == (7 * 7 + 3, 2)   # stored at the pretrain grid


def t_feature2pyramid(p, s, xs):
    def deconv(x, w, b):
        return TF.conv_transpose2d(
            x, torch.from_numpy(np.asarray(w).transpose(3, 2, 0, 1)),
            torch.from_numpy(np.asarray(b)), stride=2)

    y4 = deconv(xs[0], P(p, "up4_deconv1/weight"), P(p, "up4_deconv1/bias"))
    y4 = TF.gelu(tbn(y4, p, s, "ops_4_norm"))
    y4 = deconv(y4, P(p, "up4_deconv2/weight"), P(p, "up4_deconv2/bias"))
    y2 = deconv(xs[1], P(p, "up2_deconv/weight"), P(p, "up2_deconv/bias"))
    return y4, y2, xs[2], TF.max_pool2d(xs[3], 2, 2)


def test_feature2pyramid_matches_torch(rng):
    m = build_module_from_cfg(
        dict(type="Feature2Pyramid", embed_dim=8, rescales=[4, 2, 1, 0.5],
             norm_cfg=dict(type="BN")), NECK)
    xs = [rng.randn(1, 8, 8, 8).astype(np.float32) for _ in range(4)]
    variables = m.init(jax.random.PRNGKey(0), [jnp.asarray(x) for x in xs])
    variables = randomize(variables, seed=222)
    outs = m.apply(variables, [jnp.asarray(x) for x in xs], mutable=False)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4]
    refs = t_feature2pyramid(variables["params"],
                             variables.get("batch_stats", {}),
                             [_t(x.transpose(0, 3, 1, 2)) for x in xs])
    for got, want in zip(outs, refs):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            rtol=2e-3, atol=2e-4)


def test_beit_upernet_config_builds():
    from image_segmentation_lab_tpu.core.fileio.parse import \
        parse_and_backup_config
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    cfg = parse_and_backup_config("configs/network/beit/upernet_beit-b.py")
    cfg["model"]["backbone"].update(embed_dims=16, num_layers=4,
                                    num_heads=2, out_indices=(0, 1, 2, 3))
    cfg["model"]["neck"]["embed_dim"] = 16
    cfg["model"]["decode_head"].update(in_channels=[16] * 4, channels=16)
    cfg["model"]["auxiliary_head"].update(in_channels=16, channels=8)
    model = build_segmentor(cfg["model"])
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, method="encode_decode")
    out = model.apply(variables, x, method="encode_decode", mutable=False)
    assert out.shape == (1, 64, 64, 2)
