"""MaskFormer / Mask2Former head checkpoint conversion.

Upstream (mmseg 1.x rides mmdet's heads) stores the transformer decoder
as ``transformer_decoder.layers.N.attentions.{0,1}`` with fused
``in_proj`` MultiheadAttentions, ``norms.{0,1,2}``, ``ffns.0.layers``,
``post_norm``; embeddings as ``nn.Embedding.weight``; the mask MLP as
``mask_embed.{0,2,4}``.  MaskFormer's base FPN PixelDecoder
(``lateral_convs``/``output_convs``) maps fully; Mask2Former's
MSDeformAttnPixelDecoder has no counterpart here (measured divergence,
docs/PERF.md) so its tensors are dropped and the FPN decoder stays at
its live initialization.

MaskFormer = strict leaf-for-leaf round trip.  Mask2Former = loose load
asserting every non-pixel-decoder leaf round-trips and the pixel
decoder is untouched.
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

from convert_torch_checkpoint import convert_state_dict  # noqa: E402

import flax  # noqa: E402

from image_segmentation_lab_tpu.core.initialize import load_checkpoint
from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg


def _head_and_leaves(head_type):
    m = build_module_from_cfg(
        dict(type=head_type, in_channels=[8, 16, 32, 64],
             in_index=(0, 1, 2, 3), input_transform="multiple_select",
             channels=16, feat_channels=16, num_queries=8,
             num_decoder_layers=3, num_heads=2, feedforward_channels=32,
             dropout_ratio=0.0, num_classes=3), DECODEHEAD)
    feats = [jnp.zeros((1, 32 // (2 ** i), 32 // (2 ** i), c))
             for i, c in enumerate((8, 16, 32, 64))]
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, feats)
    flat = {".".join(k): np.asarray(le) for k, le in
            flax.traverse_util.flatten_dict(v["params"]).items()}
    return m, v, flat, feats


def _torch_sd(flat, mask2former):
    """Inverse-map our head tree into the upstream naming."""
    a_idx = ({"cross_attn": 0, "self_attn": 1} if mask2former
             else {"self_attn": 0, "cross_attn": 1})
    sd = {}
    handled = set()
    for key, arr in flat.items():
        if key in handled:
            continue
        m = re.match(r"layer(\d+)\.(self_attn|cross_attn)\.(q|k|v)_proj"
                     r"\.(weight|bias)$", key)
        if m:
            n, att, leaf = m.group(1), m.group(2), m.group(4)
            parts = []
            for p in ("q", "k", "v"):
                pk = f"layer{n}.{att}.{p}_proj.{leaf}"
                handled.add(pk)
                a = flat[pk]
                parts.append(a.T if leaf == "weight" else a)
            fused = np.concatenate(parts, 0)
            sd[f"transformer_decoder.layers.{n}.attentions."
               f"{a_idx[att]}.attn.in_proj_{leaf}"] = \
                torch.from_numpy(np.ascontiguousarray(fused))
            continue
        tk = key
        tk = re.sub(r"\blayer(\d+)\.(self_attn|cross_attn)\.out_proj\.",
                    lambda mm: (f"transformer_decoder.layers.{mm.group(1)}"
                                f".attentions.{a_idx[mm.group(2)]}"
                                ".attn.out_proj."), tk)
        tk = re.sub(r"\blayer(\d+)\.norm(\d)\.",
                    lambda mm: (f"transformer_decoder.layers.{mm.group(1)}"
                                f".norms.{int(mm.group(2)) - 1}."), tk)
        tk = re.sub(r"\blayer(\d+)\.ffn_fc1\.",
                    lambda mm: (f"transformer_decoder.layers.{mm.group(1)}"
                                ".ffns.0.layers.0.0."), tk)
        tk = re.sub(r"\blayer(\d+)\.ffn_fc2\.",
                    lambda mm: (f"transformer_decoder.layers.{mm.group(1)}"
                                ".ffns.0.layers.1."), tk)
        tk = tk.replace("decoder_norm.", "transformer_decoder.post_norm.")
        tk = re.sub(r"\bmask_embed(\d)\.",
                    lambda mm: f"mask_embed.{2 * int(mm.group(1))}.", tk)
        if tk in ("query_embed", "query_feat", "level_embed"):
            sd[tk + ".weight"] = torch.from_numpy(
                np.ascontiguousarray(arr))
            continue
        if "pixel_decoder." in tk:
            if mask2former:
                continue     # upstream ships MSDeformAttn weights instead
            tk = re.sub(r"pixel_decoder\.lateral(\d+)\.",
                        r"pixel_decoder.lateral_convs.\1.", tk)
            tk = re.sub(r"pixel_decoder\.output(\d+)\.",
                        r"pixel_decoder.output_convs.\1.", tk)
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2 and tk.endswith(".weight"):
            arr = arr.T
        sd[tk] = torch.from_numpy(np.ascontiguousarray(arr))
    return sd


def test_maskformer_head_checkpoint_roundtrips(tmp_path):
    m, v, flat, feats = _head_and_leaves("MaskFormerHead")
    sd = _torch_sd(flat, mask2former=False)
    converted = convert_state_dict(sd)
    path = tmp_path / "mf.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)
    zeroed = jax.tree.map(jnp.zeros_like, v)
    loaded, _ = load_checkpoint(zeroed, path, strict=True, logger=None)
    got = {".".join(k): np.asarray(le) for k, le in
           flax.traverse_util.flatten_dict(loaded["params"]).items()}
    assert set(got) == set(flat)
    for key in flat:
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)
    out = m.apply(loaded, feats,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out)).all()


def test_mask2former_head_checkpoint_loads_all_but_pixel_decoder(tmp_path):
    m, v, flat, feats = _head_and_leaves("Mask2FormerHead")
    # upstream Mask2Former carries MSDeformAttn pixel-decoder tensors —
    # simulate a few so the drop path is exercised
    sd = _torch_sd(flat, mask2former=True)
    sd["pixel_decoder.encoder.layers.0.attentions.0.sampling_offsets"
       ".weight"] = torch.randn(96, 16)
    sd["pixel_decoder.level_encoding.weight"] = torch.randn(3, 16)
    converted = convert_state_dict(sd)
    assert not any("pixel_decoder" in k for k in converted), \
        "MSDeformAttn pixel-decoder tensors must be dropped"
    path = tmp_path / "m2f.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)
    zeroed = jax.tree.map(jnp.zeros_like, v)
    loaded, _ = load_checkpoint(zeroed, path, strict=False, logger=None)
    got = {".".join(k): np.asarray(le) for k, le in
           flax.traverse_util.flatten_dict(loaded["params"]).items()}
    for key in flat:
        if key.startswith("pixel_decoder."):
            np.testing.assert_array_equal(
                got[key], np.zeros_like(flat[key]), err_msg=key)
        else:
            np.testing.assert_array_equal(got[key], flat[key], err_msg=key)


def test_full_mask2former_checkpoint_with_prefixes(tmp_path):
    """A FULL-model upstream checkpoint (backbone.* + decode_head.*
    prefixes) routes backbone keys through the regular rules and head
    keys through the head converter; everything except the pixel
    decoder loads."""
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    model = build_segmentor(dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 1, 1),
                      strides=(1, 2, 2, 2),
                      norm_cfg=dict(type="BN", requires_grad=True),
                      base_channels=8, stem_channels=8),
        decode_head=dict(type="Mask2FormerHead",
                         in_channels=[8, 16, 32, 64],
                         in_index=(0, 1, 2, 3),
                         input_transform="multiple_select",
                         channels=16, feat_channels=16, num_queries=8,
                         num_decoder_layers=2, num_heads=2,
                         feedforward_channels=32, dropout_ratio=0.0,
                         num_classes=3),
        test_cfg=dict(mode="whole")))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x,
                   method="encode_decode")
    flat = {}
    for coll in ("params", "batch_stats"):
        for k, le in flax.traverse_util.flatten_dict(v[coll]).items():
            flat[".".join(k)] = np.asarray(le)

    sd = {}
    for key, arr in flat.items():
        if key.startswith("decode_head."):
            continue  # head keys assembled below via the inverse mapper
        tk = key
        tk = re.sub(r"\blayer(\d)\.blocks_(\d+)\.", r"layer\1.\2.", tk)
        tk = tk.replace(".downsample_conv.", ".downsample.0.")
        tk = tk.replace(".downsample_bn.", ".downsample.1.")
        tk = re.sub(r"\bstem_(\d)\.",
                    lambda mm: f"stem.{(0, 1, 3, 4, 6, 7)[int(mm.group(1))]}.",
                    tk)
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        sd[tk] = torch.from_numpy(np.ascontiguousarray(arr))
    head_flat = {k[len("decode_head."):]: a for k, a in flat.items()
                 if k.startswith("decode_head.")}
    for k, t in _torch_sd(head_flat, mask2former=True).items():
        sd["decode_head." + k] = t

    converted = convert_state_dict(sd)
    path = tmp_path / "full.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)
    zeroed = jax.tree.map(jnp.zeros_like, v)
    loaded, _ = load_checkpoint(zeroed, path, strict=False, logger=None)
    got = {}
    for coll in ("params", "batch_stats"):
        for k, le in flax.traverse_util.flatten_dict(loaded[coll]).items():
            got[".".join(k)] = np.asarray(le)
    n_checked = 0
    for key in flat:
        if "pixel_decoder." in key:
            continue
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)
        n_checked += 1
    assert n_checked > 100
