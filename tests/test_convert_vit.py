"""Upstream-ViT checkpoint conversion: timm and mmseg state_dicts must
round-trip exactly onto this framework's ViT param tree.

Each test inverse-maps our randomly initialized ViT params into a torch
state_dict with the upstream naming/layout (transposed linears, fused
in_proj), runs the converter, loads through the real checkpoint loader with
strict=True, and asserts every leaf equals the original — so both the name
mapping and the transpose conventions are pinned leaf-for-leaf.
"""

import pickle
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from convert_torch_checkpoint import convert_state_dict  # noqa: E402

import flax  # noqa: E402

from image_segmentation_lab_tpu.core.initialize import load_checkpoint
from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg


def _vit_and_params():
    m = build_module_from_cfg(
        dict(type="VisionTransformer", arch="tiny", embed_dims=16,
             num_layers=2, num_heads=2, pretrain_img_size=32, patch_size=8,
             final_norm=True, out_indices=(-1,)), BACKBONE)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, jnp.zeros((1, 32, 32, 3)))
    flat = {".".join(k): np.asarray(le) for k, le in
            flax.traverse_util.flatten_dict(v["params"]).items()}
    return m, v, flat


def _t(a):
    return torch.from_numpy(np.ascontiguousarray(a))


def _timm_sd(flat):
    """Inverse-map our params into timm vision_transformer naming."""
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = tk.replace("patch_embed_proj.", "patch_embed.proj.")
        for i in range(8):
            tk = tk.replace(f"block{i}.", f"blocks.{i}.")
        tk = tk.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
        if tk.startswith("norm1."):
            tk = tk.replace("norm1.", "norm.")
        if arr.ndim == 4:        # HWIO → OIHW
            arr = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2 and key.endswith(".weight"):
            arr = arr.T          # (in,out) → (out,in)
        sd[tk] = _t(arr)
    return sd


def _mmseg_sd(flat):
    """Inverse-map into mmseg VisionTransformer naming (fused in_proj)."""
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = tk.replace("patch_embed_proj.", "patch_embed.projection.")
        for i in range(8):
            tk = tk.replace(f"block{i}.", f"layers.{i}.")
        tk = tk.replace(".norm1.", ".ln1.").replace(".norm2.", ".ln2.")
        tk = tk.replace(".attn.qkv.weight", ".attn.attn.in_proj_weight")
        tk = tk.replace(".attn.qkv.bias", ".attn.attn.in_proj_bias")
        tk = tk.replace(".attn.proj.", ".attn.attn.out_proj.")
        tk = tk.replace(".fc1.", ".ffn.layers.0.0.")
        tk = tk.replace(".fc2.", ".ffn.layers.1.")
        if tk.startswith("norm1."):
            tk = "ln1." + tk[len("norm1."):]
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2 and key.endswith(".weight"):
            arr = arr.T
        sd[tk] = _t(arr)
    return sd


def _roundtrip(make_sd, tmp_path):
    m, v, flat = _vit_and_params()
    sd = make_sd(flat)
    converted = convert_state_dict(sd)
    path = tmp_path / "vit.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)

    # zero the live tree so the load provably writes every leaf
    zeroed = jax.tree.map(jnp.zeros_like, v)
    loaded, _ = load_checkpoint(zeroed, path, strict=True, logger=None)
    got = {".".join(k): np.asarray(le) for k, le in
           flax.traverse_util.flatten_dict(loaded["params"]).items()}
    assert set(got) == set(flat)
    for key in flat:
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)

    # and the loaded tree runs
    out = m.apply(loaded, jnp.zeros((1, 32, 32, 3)))
    feat = out[-1] if isinstance(out, (list, tuple)) else out
    assert np.isfinite(np.asarray(feat)).all()


def test_timm_vit_checkpoint_roundtrips(tmp_path):
    _roundtrip(_timm_sd, tmp_path)


def test_mmseg_vit_checkpoint_roundtrips(tmp_path):
    _roundtrip(_mmseg_sd, tmp_path)


# ---------------------------------------------------------------- Swin
def _swin_and_params():
    m = build_module_from_cfg(
        dict(type="SwinTransformer", arch="tiny", window_size=8,
             out_indices=(0, 1, 2, 3)), BACKBONE)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3)))
    flat = {".".join(k): np.asarray(le) for k, le in
            flax.traverse_util.flatten_dict(v["params"]).items()}
    return m, v, flat


def _swin_common(key, arr):
    if arr.ndim == 4:
        arr = arr.transpose(3, 2, 0, 1)
    elif arr.ndim == 2 and key.endswith(".weight"):
        arr = arr.T
    return arr


def _mmseg_swin_sd(flat):
    """mmseg/mmcv SwinTransformer naming: stages.N.blocks.M, attn.w_msa,
    ffn.layers, patch_embed.projection, norm0..norm3."""
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = tk.replace("patch_embed_proj.", "patch_embed.projection.")
        tk = tk.replace("patch_embed_norm.", "patch_embed.norm.")
        for i in range(4):
            for j in range(18):
                tk = tk.replace(f"stage{i}_block{j}.",
                                f"stages.{i}.blocks.{j}.")
            tk = tk.replace(f"downsample{i}.", f"stages.{i}.downsample.")
        tk = tk.replace(".attn.qkv.", ".attn.w_msa.qkv.")
        tk = tk.replace(".attn.proj.", ".attn.w_msa.proj.")
        tk = tk.replace(".attn.relative_position_bias_table",
                        ".attn.w_msa.relative_position_bias_table")
        tk = tk.replace(".fc1.", ".ffn.layers.0.0.")
        tk = tk.replace(".fc2.", ".ffn.layers.1.")
        sd[tk] = _t(_swin_common(key, arr))
    # a derived buffer upstream serializes but we rebuild statically
    sd["stages.0.blocks.0.attn.w_msa.relative_position_index"] = \
        torch.zeros(64, 64, dtype=torch.long)
    return sd


def _timm_swin_sd(flat):
    """timm swin_transformer naming: layers.N.blocks.M, fused qkv, mlp,
    a single final `norm` (≡ our norm3); no norm0..2."""
    sd = {}
    for key, arr in flat.items():
        tk = key
        if tk.startswith(("norm0.", "norm1.", "norm2.")):
            continue  # timm has no per-stage out-norms
        tk = tk.replace("patch_embed_proj.", "patch_embed.proj.")
        tk = tk.replace("patch_embed_norm.", "patch_embed.norm.")
        if tk.startswith("norm3."):
            tk = "norm." + tk[len("norm3."):]
        for i in range(4):
            for j in range(18):
                tk = tk.replace(f"stage{i}_block{j}.",
                                f"layers.{i}.blocks.{j}.")
            tk = tk.replace(f"downsample{i}.", f"layers.{i}.downsample.")
        tk = tk.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
        sd[tk] = _t(_swin_common(key, arr))
    return sd


def test_mmseg_swin_checkpoint_roundtrips(tmp_path):
    m, v, flat = _swin_and_params()
    converted = convert_state_dict(_mmseg_swin_sd(flat))
    path = tmp_path / "swin.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)
    zeroed = jax.tree.map(jnp.zeros_like, v)
    loaded, _ = load_checkpoint(zeroed, path, strict=True, logger=None)
    got = {".".join(k): np.asarray(le) for k, le in
           flax.traverse_util.flatten_dict(loaded["params"]).items()}
    assert set(got) == set(flat)
    for key in flat:
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)


def test_timm_swin_checkpoint_loads_nonstrict(tmp_path):
    m, v, flat = _swin_and_params()
    converted = convert_state_dict(_timm_swin_sd(flat))
    # final `norm` must land on norm3, not the ViT-style norm1
    assert any(k.startswith("norm3.") for k in converted)
    assert not any(k.startswith("norm1.") for k in converted)
    path = tmp_path / "swin_timm.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)
    loaded, _ = load_checkpoint(jax.tree.map(jnp.zeros_like, v), path,
                                strict=False, logger=None)
    got = {".".join(k): np.asarray(le) for k, le in
           flax.traverse_util.flatten_dict(loaded["params"]).items()}
    untouched = 0
    for key in flat:
        if key.startswith(("norm0.", "norm1.", "norm2.")):
            untouched += 1  # absent in timm checkpoints — stay zeroed
            assert not np.asarray(got[key]).any()
        else:
            np.testing.assert_array_equal(got[key], flat[key], err_msg=key)
    assert untouched == 6  # 3 out-norms x (weight, bias)


# ------------------------------------------------------------- ConvNeXt
def _convnext_and_params():
    m = build_module_from_cfg(
        dict(type="ConvNeXt", arch="tiny", out_indices=(0, 1, 2, 3)),
        BACKBONE)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)))
    flat = {".".join(k): np.asarray(le) for k, le in
            flax.traverse_util.flatten_dict(v["params"]).items()}
    return m, v, flat


def _convnext_tensor(key, arr):
    if key.endswith(("pwconv1.weight", "pwconv2.weight")):
        h, w, cin, cout = arr.shape     # (1,1,in,out) → Linear (out,in)
        return arr.reshape(cin, cout).T
    if arr.ndim == 4:
        return arr.transpose(3, 2, 0, 1)
    return arr


def _mmpretrain_convnext_sd(flat):
    """mmpretrain/mmseg ConvNeXt naming: downsample_layers, stages.N.M,
    depthwise/pointwise_conv, Linear pointwise layers."""
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = tk.replace("stem_conv.", "downsample_layers.0.0.")
        tk = tk.replace("stem_norm.", "downsample_layers.0.1.")
        for i in range(1, 4):
            tk = tk.replace(f"downsample{i}_norm.",
                            f"downsample_layers.{i}.0.")
            tk = tk.replace(f"downsample{i}_conv.",
                            f"downsample_layers.{i}.1.")
        for i in range(4):
            for j in range(27):
                tk = tk.replace(f"stage{i}_block{j}.", f"stages.{i}.{j}.")
        tk = tk.replace(".dwconv.", ".depthwise_conv.")
        tk = tk.replace(".pwconv1.", ".pointwise_conv1.")
        tk = tk.replace(".pwconv2.", ".pointwise_conv2.")
        sd[tk] = _t(_convnext_tensor(key, arr))
    return sd


def _timm_convnext_sd(flat):
    """timm ConvNeXt naming: stem.0/1, stages.N.blocks.M, conv_dw,
    mlp.fc1/fc2 (Linear).  Out-norms norm0..3 pass through unchanged
    (timm feature checkpoints lack them; kept so the strict loader
    exercises every leaf)."""
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = tk.replace("stem_conv.", "stem.0.")
        tk = tk.replace("stem_norm.", "stem.1.")
        for i in range(1, 4):
            tk = tk.replace(f"downsample{i}_norm.",
                            f"stages.{i}.downsample.0.")
            tk = tk.replace(f"downsample{i}_conv.",
                            f"stages.{i}.downsample.1.")
        for i in range(4):
            for j in range(27):
                tk = tk.replace(f"stage{i}_block{j}.",
                                f"stages.{i}.blocks.{j}.")
        tk = tk.replace(".dwconv.", ".conv_dw.")
        tk = tk.replace(".pwconv1.", ".mlp.fc1.")
        tk = tk.replace(".pwconv2.", ".mlp.fc2.")
        sd[tk] = _t(_convnext_tensor(key, arr))
    return sd


def _convnext_roundtrip(make_sd, tmp_path):
    m, v, flat = _convnext_and_params()
    converted = convert_state_dict(make_sd(flat))
    path = tmp_path / "convnext.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)
    loaded, _ = load_checkpoint(jax.tree.map(jnp.zeros_like, v), path,
                                strict=True, logger=None)
    got = {".".join(k): np.asarray(le) for k, le in
           flax.traverse_util.flatten_dict(loaded["params"]).items()}
    assert set(got) == set(flat)
    for key in flat:
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)


def test_mmpretrain_convnext_checkpoint_roundtrips(tmp_path):
    _convnext_roundtrip(_mmpretrain_convnext_sd, tmp_path)


def test_timm_convnext_checkpoint_roundtrips(tmp_path):
    _convnext_roundtrip(_timm_convnext_sd, tmp_path)


# ------------------------------------------------------------ MiT (SegFormer)
def _mit_and_params():
    from image_segmentation_lab_tpu.core.fileio import load_python_config
    cfg = load_python_config(
        "configs/network/segformer/segformer_mit-b0.py")["model"]["backbone"]
    m = build_module_from_cfg(cfg, BACKBONE)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3)))
    flat = {".".join(k): np.asarray(le) for k, le in
            flax.traverse_util.flatten_dict(v["params"]).items()}
    return m, v, flat


def _mmseg_mit_sd(flat):
    """Inverse-map our MiT tree into mmseg MixVisionTransformer naming:
    4-level layers.N.{0,1.M,2}, fused nn.MultiheadAttention in_proj
    (rows [q;k;v]), Linear out_proj, MixFFN Conv2d stack indices."""
    sd = {}
    fused = {}
    for key, arr in flat.items():
        tk = key
        for i in range(4):
            tk = tk.replace(f"patch_embed{i + 1}_proj.",
                            f"layers.{i}.0.projection.")
            tk = tk.replace(f"patch_embed{i + 1}_norm.",
                            f"layers.{i}.0.norm.")
            for j in range(30):
                tk = tk.replace(f"stage{i + 1}_block{j + 1}.",
                                f"layers.{i}.1.{j}.")
        for i in range(4):
            if tk.startswith(f"norm{i + 1}."):
                tk = f"layers.{i}.2." + tk[len(f"norm{i + 1}."):]
        tk = tk.replace(".attn.sr_norm.", ".attn.norm.")
        tk = tk.replace(".ffn.fc1.", ".ffn.layers.0.")
        tk = tk.replace(".ffn.pe_conv.", ".ffn.layers.1.")
        tk = tk.replace(".ffn.fc2.", ".ffn.layers.4.")
        if ".attn.q." in tk or ".attn.kv." in tk:
            fused.setdefault(tk.split(".attn.")[0], {})[
                tk.split(".attn.")[1]] = (key, arr)
            continue
        if ".attn.proj." in tk and arr.ndim == 4:
            h, w, cin, cout = arr.shape
            sd[tk.replace(".attn.proj.", ".attn.attn.out_proj.")] = \
                _t(arr.reshape(cin, cout).T)
            continue
        if ".attn.proj." in tk:
            sd[tk.replace(".attn.proj.", ".attn.attn.out_proj.")] = _t(arr)
            continue
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2 and key.endswith(".weight"):
            arr = arr.T
        sd[tk] = _t(arr)
    for base, parts in fused.items():
        qw = parts["q.weight"][1]
        kvw = parts["kv.weight"][1]
        C = qw.shape[2]
        w = np.concatenate(
            [qw.reshape(C, C).T, kvw.reshape(C, 2 * C).T], axis=0)
        sd[base + ".attn.attn.in_proj_weight"] = _t(w)
        b = np.concatenate([parts["q.bias"][1], parts["kv.bias"][1]])
        sd[base + ".attn.attn.in_proj_bias"] = _t(b)
    return sd


def test_mmseg_mit_checkpoint_roundtrips(tmp_path):
    m, v, flat = _mit_and_params()
    converted = convert_state_dict(_mmseg_mit_sd(flat))
    path = tmp_path / "mit.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)
    loaded, _ = load_checkpoint(jax.tree.map(jnp.zeros_like, v), path,
                                strict=True, logger=None)
    got = {".".join(k): np.asarray(le) for k, le in
           flax.traverse_util.flatten_dict(loaded["params"]).items()}
    assert set(got) == set(flat)
    for key in flat:
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)
