"""Converter round-trips for the remaining zoo families (VERDICT r3
weak-item 3 backlog): ResNeSt (SplAtConv2d norms + the avg-down
``downsample.{1,2}`` Sequential layout), PoolFormer (the upstream
interleaved ``network.N`` list), and Twins PCPVT/SVT (mmseg naming —
GSA layers subclass MiT's EfficientMultiheadAttention, so the fused
``in_proj`` splits into q/kv 1x1 convs; LSA layers keep Linear qkv).

Same leaf-for-leaf pattern as ``test_convert_vit.py``: inverse-map our
randomly initialized tree into the upstream naming, convert,
strict-load, compare every leaf.
"""

import pickle
import re
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from convert_torch_checkpoint import convert_key, convert_state_dict  # noqa: E402

import flax  # noqa: E402

from image_segmentation_lab_tpu.core.initialize import load_checkpoint
from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg


def _leaves(m, v):
    flat = {}
    for coll in v:
        if coll in ("params", "batch_stats", "frozen_params"):
            for k, le in flax.traverse_util.flatten_dict(v[coll]).items():
                flat[".".join(k)] = np.asarray(le)
    return flat


def _roundtrip(m, v, flat, sd, tmp_path, run_input=None):
    converted = convert_state_dict(sd)
    path = tmp_path / "ckpt.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)
    zeroed = jax.tree.map(jnp.zeros_like, v)
    loaded, _ = load_checkpoint(zeroed, path, strict=True, logger=None)
    got = _leaves(m, loaded)
    assert set(got) == set(flat), (
        sorted(set(flat) - set(got))[:5], sorted(set(got) - set(flat))[:5])
    for key in flat:
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)
    if run_input is not None:
        out = m.apply(loaded, run_input,
                      rngs={"dropout": jax.random.PRNGKey(2)})
        feats = out if isinstance(out, (list, tuple)) else [out]
        assert all(np.isfinite(np.asarray(f)).all() for f in feats)


def _t(arr, key):
    if arr.ndim == 4:                       # HWIO → OIHW
        arr = arr.transpose(3, 2, 0, 1)
    elif arr.ndim == 2 and key.endswith(".weight"):
        arr = arr.T                         # (in,out) → (out,in)
    return torch.from_numpy(np.ascontiguousarray(arr))


# ------------------------------------------------------------- ResNeSt

def test_resnest_checkpoint_roundtrips(tmp_path):
    m = build_module_from_cfg(
        dict(type="ResNeSt", depth=50, stem_channels=16, base_channels=4,
             norm_cfg=dict(type="BN")), BACKBONE)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    flat = _leaves(m, v)
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = re.sub(r"\blayer(\d)\.blocks_(\d+)\.", r"layer\1.\2.", tk)
        tk = tk.replace(".conv2.norm0.", ".conv2.bn0.")
        tk = tk.replace(".conv2.norm1.", ".conv2.bn1.")
        # ResNeSt downsample = Sequential(AvgPool2d, conv, bn)
        tk = tk.replace(".downsample_conv.", ".downsample.1.")
        tk = tk.replace(".downsample_bn.", ".downsample.2.")
        tk = re.sub(r"\bstem_(\d)\.",
                    lambda mm: f"stem.{(0, 1, 3, 4, 6, 7)[int(mm.group(1))]}.",
                    tk)
        sd[tk] = _t(arr, tk)
    _roundtrip(m, v, flat, sd, tmp_path, run_input=x)


def test_avgdown_gate_only_fires_structurally():
    """Without a `.downsample.2.` key the plain (conv, bn) mapping must
    stay untouched."""
    assert convert_key("layer2.0.downsample.0.weight") == \
        "layer2.blocks_0.downsample_conv.weight"
    assert convert_key("layer2.0.downsample.1.weight", avg_down=True) == \
        "layer2.blocks_0.downsample_conv.weight"
    assert convert_key("layer2.0.downsample.2.running_mean",
                       avg_down=True) == \
        "layer2.blocks_0.downsample_bn.running_mean"


# ---------------------------------------------------------- PoolFormer

def test_poolformer_checkpoint_roundtrips(tmp_path):
    m = build_module_from_cfg(dict(type="PoolFormer", arch="s12"), BACKBONE)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    flat = _leaves(m, v)
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = re.sub(r"\bpatch_embed0\.", "patch_embed.proj.", tk)
        tk = re.sub(r"\bpatch_embed(\d)\.",
                    lambda mm: f"network.{2 * int(mm.group(1)) - 1}.proj.",
                    tk)
        tk = re.sub(r"\bstage(\d)_block(\d+)\.",
                    lambda mm: (f"network.{2 * int(mm.group(1))}"
                                f".{mm.group(2)}."), tk)
        tk = re.sub(r"\bnorm(\d)\.",
                    lambda mm: f"norm{2 * int(mm.group(1))}.", tk)
        tk = tk.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
        sd[tk] = _t(arr, tk)
    _roundtrip(m, v, flat, sd, tmp_path, run_input=x)


# ------------------------------------------------------------- Twins

def _twins_sd(flat):
    """Inverse-map our Twins tree into mmseg naming (fused in_proj for
    GSA attention, Linear qkv for LSA window attention)."""
    sd = {}
    handled = set()
    for key, arr in flat.items():
        if key in handled:
            continue
        tk = key
        tk = re.sub(r"\bembed(\d)_conv\.", r"patch_embeds.\1.projection.",
                    tk)
        tk = re.sub(r"\bembed(\d)_norm\.", r"patch_embeds.\1.norm.", tk)
        tk = re.sub(r"\bpeg(\d)\.proj\.", r"position_encodings.\1.proj.0.",
                    tk)
        tk = re.sub(r"\bnorm_after(\d)\.", r"norm_after_stage.\1.", tk)
        tk = re.sub(r"\bstage(\d)_block(\d+)\.", r"layers.\1.\2.", tk)
        tk = tk.replace(".attn.sr_norm.", ".attn.norm.")
        tk = tk.replace(".ffn.fc1.", ".ffn.layers.0.0.")
        tk = tk.replace(".ffn.fc2.", ".ffn.layers.1.")
        if ".attn.q." in key:              # GSA: fuse q+kv back to in_proj
            base = key.split(".attn.q.")[0] + ".attn."
            leaf = key.rsplit(".", 1)[1]
            q = flat[base + "q." + leaf]
            kv = flat[base + "kv." + leaf]
            handled.add(base + "kv." + leaf)
            tbase = tk.split(".attn.q.")[0] + ".attn.attn.in_proj_"
            if leaf == "weight":           # ours (1,1,in,out) 1x1 convs
                q2 = q[0, 0].T             # (out,in)
                kv2 = kv[0, 0].T
                sd[tbase + "weight"] = torch.from_numpy(
                    np.ascontiguousarray(np.concatenate([q2, kv2], 0)))
            else:
                sd[tbase + "bias"] = torch.from_numpy(
                    np.ascontiguousarray(np.concatenate([q, kv], 0)))
            continue
        if ".attn.kv." in key:
            continue                       # consumed with its q sibling
        if ".attn.proj." in key and arr.ndim == 4:   # GSA out proj (1x1)
            tk = tk.replace(".attn.proj.", ".attn.attn.out_proj.")
            arr = arr[0, 0]                # (in,out) → Linear transpose below
            sd[tk] = torch.from_numpy(np.ascontiguousarray(arr.T))
            continue
        if ".attn.proj.bias" in key and \
                key.replace(".proj.bias", ".q.weight") in flat:
            tk = tk.replace(".attn.proj.", ".attn.attn.out_proj.")
        sd[tk] = _t(arr, tk)
    return sd


def _twins_roundtrip(cfg, tmp_path):
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    flat = _leaves(m, v)
    _roundtrip(m, v, flat, _twins_sd(flat), tmp_path, run_input=x)


def test_twins_pcpvt_checkpoint_roundtrips(tmp_path):
    _twins_roundtrip(dict(type="PCPVT", arch="pcpvt-small"), tmp_path)


def test_twins_svt_checkpoint_roundtrips(tmp_path):
    _twins_roundtrip(dict(type="SVT", arch="svt-small"), tmp_path)
