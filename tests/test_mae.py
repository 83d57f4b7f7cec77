"""MAE backbone (beyond-reference): torch-golden full wiring (BEiT
blocks + learned absolute pos embed), fix_init_weight depth rescaling,
pos-table resample contract.  Config build is covered by the all-configs
glob test."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_beit import t_beit_block, _tln
from test_zoo_torch_parity import P, randomize, tconv

torch.set_grad_enabled(False)


def test_mae_full_backbone_matches_torch(rng):
    """Full wiring at the pretraining grid: patch embed + cls token +
    absolute pos embed + BEiT blocks + final norm + taps.  The block
    math itself is golden in test_beit.py; this pins MAE's additions
    (the pos-embed add and the tap/norm wiring around the shared block).
    """
    grid, C, heads = 4, 16, 2
    m = build_module_from_cfg(
        dict(type="MAE", embed_dims=C, num_layers=2, num_heads=heads,
             patch_size=8, pretrain_img_size=32, out_indices=(0, 1),
             final_norm=True), BACKBONE)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=331)
    o0, o1 = m.apply(variables, jnp.asarray(x), mutable=False)
    p = variables["params"]
    h = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)),
              P(p, "patch_embed_proj/weight"), stride=8,
              bias=np.asarray(P(p, "patch_embed_proj/bias")))
    toks = h.flatten(2).transpose(1, 2)                 # (1, 16, C)
    cls = torch.from_numpy(np.asarray(P(p, "cls_token")))
    toks = torch.cat([cls.expand(1, 1, C), toks], dim=1)
    toks = toks + torch.from_numpy(np.asarray(P(p, "pos_embed")))
    toks = t_beit_block(p["block0"], toks, heads, grid)
    ref0 = toks[:, 1:].reshape(1, grid, grid, C)
    toks = t_beit_block(p["block1"], toks, heads, grid)
    toks = _tln(toks, p, "norm1")
    ref1 = toks[:, 1:].reshape(1, grid, grid, C)
    np.testing.assert_allclose(np.asarray(o0), ref0.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(o1), ref1.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_mae_fix_init_weight_rescales_by_depth():
    """Upstream fix_init_weight: block i (1-based) divides attn-proj and
    fc2 init by sqrt(2 i).  Same PRNG key with fix_init on/off must give
    exactly rescaled weights (and leave every other param untouched)."""
    cfg = dict(type="MAE", embed_dims=16, num_layers=3, num_heads=2,
               patch_size=8, pretrain_img_size=32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    fixed = build_module_from_cfg(dict(cfg, fix_init=True), BACKBONE).init(
        jax.random.PRNGKey(7), x)["params"]
    plain = build_module_from_cfg(dict(cfg, fix_init=False), BACKBONE).init(
        jax.random.PRNGKey(7), x)["params"]
    for i in range(3):
        scale = math.sqrt(2.0 * (i + 1))
        for path in (f"block{i}/attn/proj/weight", f"block{i}/fc2/weight"):
            np.testing.assert_allclose(
                np.asarray(P(fixed, path)),
                np.asarray(P(plain, path)) / scale, rtol=1e-6, atol=1e-8)
        for path in (f"block{i}/attn/qkv/weight", f"block{i}/fc1/weight",
                     f"block{i}/attn/proj/bias"):
            np.testing.assert_array_equal(np.asarray(P(fixed, path)),
                                          np.asarray(P(plain, path)))


def test_mae_pos_and_rel_tables_resample_from_pretrain_grid(rng):
    """Runtime grid 6x6 != pretraining grid 4x4: both the absolute pos
    table and the per-block rel-pos table stay stored at the pretrain
    grid and resample inside the program; outputs keep the runtime grid.
    At the pretrain grid the pos table passes through bit-identically
    (resample branch not traced)."""
    m = build_module_from_cfg(
        dict(type="MAE", embed_dims=16, num_layers=2, num_heads=2,
             patch_size=8, pretrain_img_size=32, out_indices=(1,)),
        BACKBONE)
    x = jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x, mutable=False)
    assert out.shape == (1, 6, 6, 16)
    p = variables["params"]
    assert np.asarray(p["pos_embed"]).shape == (1, 4 * 4 + 1, 16)
    tab = p["block0"]["attn"]["relative_position_bias_table"]
    assert tab.shape == (7 * 7 + 3, 2)

    # pretrain-grid input: same params, 4x4 output, no resample branch
    x0 = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    out0 = m.apply(variables, x0, mutable=False)
    assert out0.shape == (1, 4, 4, 16)


def test_beit_block_init_rescale_default_is_identity():
    """BEiT itself must be unaffected by the new init_rescale hook."""
    from image_segmentation_lab_tpu.models.backbones.beit import BEiTBlock
    x = jnp.zeros((1, 17, 16), jnp.float32)
    a = BEiTBlock(16, 2, 4).init(jax.random.PRNGKey(3), x)["params"]
    b = BEiTBlock(16, 2, 4, init_rescale=1.0).init(
        jax.random.PRNGKey(3), x)["params"]
    for pa, pb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
