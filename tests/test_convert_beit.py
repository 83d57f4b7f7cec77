"""Upstream-BEiT/MAE checkpoint conversion (VERDICT r3 item 3): timm and
mmseg state_dicts must round-trip leaf-for-leaf onto this framework's
BEiT/MAE param trees through the strict loader, and the converter's
``--rel-pos-grid`` geometric resample must reproduce upstream's
load-time interpolation semantics (so converted checkpoints carry a
table already at the fine-tune grid and the trace-time bicubic
divergence disappears).

Same method as tests/test_convert_vit.py: inverse-map our randomly
initialized params into the upstream naming/layout, convert, strict-load,
compare every leaf.
"""

import pickle
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from convert_torch_checkpoint import (_geometric_rel_pos_resample,  # noqa: E402
                                      convert_state_dict,
                                      resample_rel_pos_tables)

import flax  # noqa: E402

from image_segmentation_lab_tpu.core.initialize import load_checkpoint
from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg


def _t(a):
    return torch.from_numpy(np.ascontiguousarray(a))


def _beit_and_params(mae=False, pretrain=32):
    cfg = dict(type="MAE" if mae else "BEiT", arch="tiny", embed_dims=16,
               num_layers=2, num_heads=2, pretrain_img_size=pretrain,
               patch_size=8, final_norm=True, out_indices=(0, 1))
    m = build_module_from_cfg(cfg, BACKBONE)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, jnp.zeros((1, 32, 32, 3)))
    # randomize the zero-init leaves (bias tables, gammas, biases) so the
    # round-trip provably writes them
    leaves, tree = jax.tree_util.tree_flatten(v)
    r = np.random.RandomState(3)
    leaves = [jnp.asarray(r.randn(*le.shape).astype(np.float32))
              for le in leaves]
    v = jax.tree_util.tree_unflatten(tree, leaves)
    flat = {".".join(k): np.asarray(le) for k, le in
            flax.traverse_util.flatten_dict(v["params"]).items()}
    return m, v, flat


def _common_tensor(key, arr):
    if arr.ndim == 4:
        return arr.transpose(3, 2, 0, 1)  # HWIO → OIHW
    if arr.ndim == 2 and key.endswith(".weight"):
        return arr.T
    return arr


def _timm_beit_sd(flat):
    """timm beit naming: blocks.N, mlp.fc1/2, patch_embed.proj, final
    `norm`, q_bias/v_bias + a zero k_bias buffer, gamma_1/2, bias table
    + the derived relative_position_index buffer."""
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = tk.replace("patch_embed_proj.", "patch_embed.proj.")
        for i in range(8):
            tk = tk.replace(f"block{i}.", f"blocks.{i}.")
        tk = tk.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
        if tk.startswith("norm1."):
            tk = tk.replace("norm1.", "norm.")
        sd[tk] = _t(_common_tensor(key, arr))
    C = flat["block0.attn.q_bias"].shape[0]
    sd["blocks.0.attn.k_bias"] = torch.zeros(C)  # dropped by the converter
    sd["blocks.0.attn.relative_position_index"] = \
        torch.zeros(17, 17, dtype=torch.long)
    return sd


def _mmseg_beit_sd(flat, mae=False):
    """mmseg BEiT/MAE naming: layers.N.{ln1,ln2,attn.*,ffn.layers,gamma}."""
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = tk.replace("patch_embed_proj.", "patch_embed.projection.")
        for i in range(8):
            tk = tk.replace(f"block{i}.", f"layers.{i}.")
        tk = tk.replace(".norm1.", ".ln1.").replace(".norm2.", ".ln2.")
        tk = tk.replace(".fc1.", ".ffn.layers.0.0.")
        tk = tk.replace(".fc2.", ".ffn.layers.1.")
        if tk.startswith("norm1."):
            tk = ("ln1." if not mae else "norm1.") + tk[len("norm1."):]
        sd[tk] = _t(_common_tensor(key, arr))
    return sd


def _roundtrip(m, v, flat, sd, tmp_path, rel_pos_grid=None):
    converted = convert_state_dict(sd)
    if rel_pos_grid:
        converted = resample_rel_pos_tables(converted, rel_pos_grid)
    path = tmp_path / "ckpt.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)
    zeroed = jax.tree.map(jnp.zeros_like, v)
    loaded, _ = load_checkpoint(zeroed, path, strict=True, logger=None)
    got = {".".join(k): np.asarray(le) for k, le in
           flax.traverse_util.flatten_dict(loaded["params"]).items()}
    assert set(got) == set(flat)
    return got, loaded


def test_timm_beit_checkpoint_roundtrips(tmp_path):
    m, v, flat = _beit_and_params()
    got, loaded = _roundtrip(m, v, flat, _timm_beit_sd(flat), tmp_path)
    for key in flat:
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)
    out = m.apply(loaded, jnp.zeros((1, 32, 32, 3)))
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_mmseg_beit_checkpoint_roundtrips(tmp_path):
    m, v, flat = _beit_and_params()
    got, _ = _roundtrip(m, v, flat, _mmseg_beit_sd(flat), tmp_path)
    for key in flat:
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)


def test_mmseg_mae_checkpoint_roundtrips(tmp_path):
    """MAE = BEiT tree + pos_embed (passes through unchanged)."""
    m, v, flat = _beit_and_params(mae=True)
    assert "pos_embed" in flat
    got, loaded = _roundtrip(m, v, flat, _mmseg_beit_sd(flat, mae=True),
                             tmp_path)
    for key in flat:
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)
    out = m.apply(loaded, jnp.zeros((1, 32, 32, 3)))
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


# ------------------------------------------------ geometric resample
def test_geometric_resample_identity_and_knots():
    r = np.random.RandomState(0)
    field = r.randn(7 * 7, 3).astype(np.float32)  # src grid g0=4 → 7x7
    # src == dst: exact identity
    np.testing.assert_array_equal(
        _geometric_rel_pos_resample(field, 7), field)
    # a constant field resamples to the same constant (splines reproduce
    # degree-0 exactly)
    const = np.full((7 * 7, 2), 1.25, np.float32)
    out = _geometric_rel_pos_resample(const, 11)
    np.testing.assert_allclose(out, 1.25, rtol=1e-6)
    assert out.shape == (11 * 11, 2)
    # the center offset (0,0) is a spline knot in both grids: the center
    # value must be preserved exactly (up to float eval noise)
    out = _geometric_rel_pos_resample(field, 11)
    np.testing.assert_allclose(out[(11 * 11) // 2], field[(7 * 7) // 2],
                               rtol=1e-5)


def test_resample_rel_pos_tables_keeps_cls_rows():
    r = np.random.RandomState(1)
    table = r.randn(7 * 7 + 3, 2).astype(np.float32)
    out = resample_rel_pos_tables(
        {"block0.attn.relative_position_bias_table": table,
         "block0.attn.proj.weight": table.copy()}, dst_grid=6)
    resampled = out["block0.attn.relative_position_bias_table"]
    assert resampled.shape == (11 * 11 + 3, 2)
    np.testing.assert_array_equal(resampled[-3:], table[-3:])
    # non-table keys untouched
    np.testing.assert_array_equal(out["block0.attn.proj.weight"], table)


def test_resampled_checkpoint_loads_at_finetune_grid(tmp_path):
    """End-to-end: a pretrain-grid (4x4) mmseg BEiT checkpoint converted
    with --rel-pos-grid 6 strict-loads into a model whose
    pretrain_img_size is the 48px fine-tune resolution (grid 6) — no
    trace-time resample runs because the stored table already matches."""
    m48, v48, flat48 = _beit_and_params(pretrain=48)
    # source checkpoint at grid 4: take the same params but with
    # grid-4-sized bias tables
    m32, v32, flat32 = _beit_and_params(pretrain=32)
    sd = _mmseg_beit_sd(flat32)
    converted = resample_rel_pos_tables(convert_state_dict(sd), 6)
    path = tmp_path / "beit_g6.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)
    loaded, _ = load_checkpoint(jax.tree.map(jnp.zeros_like, v48), path,
                                strict=True, logger=None)
    out = m48.apply(loaded, jnp.zeros((1, 48, 48, 3)))
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
