"""Convert reference (torch) checkpoints to this framework's format.

A user of the reference lab has ``.pth`` files saved by its ``save_model``
(``{'metadata', 'state_dict'}`` with torch tensors, train_utils.py:160-165)
or raw torch ``state_dict``s.  This tool maps them onto this framework's
naming and layout so ``--load-from`` / ``PretrainedInit`` work:

* conv kernels OIHW → HWIO transpose (covers grouped/depthwise convs);
  linear (out,in) → (in,out);
* name rewrites for the structural differences (torch Sequential indices vs
  linen list fields): ``layerN.K.`` → ``layerN.blocks_K.``,
  ``downsample.0/1`` → ``downsample_conv/bn``, ``convs.K`` → ``convs_K``,
  ASPP/PPM branch indices → ``branches_K``, deep-stem Sequential indices →
  ``stem_K`` (ReLU slots removed);
* norm ``num_batches_tracked`` dropped (our BatchNorm has fixed momentum);
* reference MobileNetV2 (``layer{i}.{j}.conv.{k}`` InvertedResidual
  Sequentials → ``stages_{i-1}_{j}.conv_{k}``), MobileNetV3 (top-level
  ``layer{i}`` stages → the ``layers_{i}`` list; gated on the
  ``linear_conv`` marker) and ICNet (``conv_sub1.{j}`` → ``conv_sub1_{j}``,
  ``psp_modules.{i}.1`` → ``psp_modules.branches_{i}``, wrapped backbone
  rides the ResNet rules) — so every checkpoint the reference lab's own
  ``save_model`` (utils/train_utils.py:160-165) can emit now converts;
* upstream ViT checkpoints in timm naming (``blocks.N``, ``mlp.fc1/2``,
  ``patch_embed.proj``, top-level ``norm``) and mmseg naming
  (``layers.N.ln1/ln2``, ``attn.attn.in_proj_*``/``out_proj``,
  ``ffn.layers.0.0/1``, ``patch_embed.projection``) map onto this
  framework's ``block{i}`` tree, with the fused ``in_proj_weight``
  transposed like any linear;
* upstream Swin checkpoints (timm ``layers.N.blocks.M`` or mmseg/mmcv
  ``stages.N.blocks.M`` + ``attn.w_msa`` + ``ffn.layers``) map onto the
  ``stage{i}_block{j}`` / ``downsample{i}`` tree; derived buffers
  (``relative_position_index``, ``attn_mask``) are dropped — our modules
  rebuild them statically.  Note window_size must match: bias tables are
  (2*ws-1)² rows and are not resampled here;
* upstream ConvNeXt checkpoints (timm ``stem``/``conv_dw``/``mlp.fc*`` or
  mmpretrain/mmseg ``downsample_layers``/``depthwise_conv``/
  ``pointwise_conv*``) map onto the ``stem_*``/``downsample{i}_*``/
  ``stage{i}_block{j}`` tree, with the Linear pointwise layers reshaped
  to our 1x1-conv HWIO kernels;
* upstream SegFormer/MiT checkpoints (mmseg MixVisionTransformer:
  4-level ``layers.N.{0,1.M,2}``) map onto the 1-indexed
  ``patch_embed{i}_*`` / ``stage{i}_block{j}`` / ``norm{i}`` tree; the
  fused ``in_proj_weight`` splits into our ``q``/``kv`` 1x1 convs and
  ``out_proj`` reshapes to the ``proj`` conv;
* reference HRNet checkpoints (hrnet.py ``stageS.m.branches.i.n``,
  ``fuse_layers.i.j[.k].{0,1}``, ``transitionT.i[.j].{0,1}`` Sequential
  indices) map onto the ``stages_{S-2}_{m}`` / ``transitions_{T-1}``
  tree with ``conv``/``bn`` named fields;
* ResNeSt checkpoints: SplAtConv2d ``conv2.bn0/bn1`` → ``norm0/norm1``,
  plus the avg-down ``downsample.{1,2}`` Sequential layout (detected
  structurally from a ``.downsample.2.`` key — also covers mmseg
  ResNet(V1d) checkpoints saved with ``avg_down=True``);
* PoolFormer checkpoints (original repo / timm / mmpretrain): the
  interleaved ``network.N`` list (even = block stages, odd = embeds)
  maps onto ``patch_embed{i}`` / ``stage{i}_block{j}``, mmpretrain's
  network-indexed out-norms (norm0/2/4/6) onto our stage-indexed ones;
* Twins PCPVT/SVT checkpoints (mmseg naming): GSA layers' fused
  ``attn.attn.in_proj`` splits into q/kv 1x1 convs (the layers subclass
  MiT's EfficientMultiheadAttention upstream too), LSA window layers
  keep Linear qkv; ``position_encodings.N.proj.0`` → ``peg{i}``;
* SegNeXt/MSCAN (mmseg naming): StemConv Sequential, OverlapPatchEmbed
  proj/norm, 1-indexed blocks, nested mlp.dwconv — a dedicated key
  function so block ``mlp.fc1`` survives the generic ViT rules;
* BiSeNetV1 (SpatialPath named layers, ARM/FFM/gap Sequential indices;
  wrapped ResNet rides the ResNet rules) and BiSeNetV2 (DetailBranch
  list, semantic stage1/stage4_CEBlock naming, GELayer dwconv/conv2/
  shortcut Sequentials, BGALayer conv pairs).  PIDNet/DDRNet/STDC are
  deliberately NOT mapped: this repo's expansion-4 Bottleneck (PIDNet/
  DDRNet divergence (b)) and avgpool-skip STDCModule give tensors
  upstream checkpoints cannot fill shape-for-shape (docs/NEXT.md);
* MaskFormer / Mask2Former heads (mmseg-1.x/mmdet naming): fused
  decoder ``in_proj`` splits into q/k/v_proj Linears with the
  self/cross role swap between the two layer orders handled;
  embeddings, mask MLP, post_norm and MaskFormer's FPN pixel decoder
  map; Mask2Former's MSDeformAttnPixelDecoder tensors are dropped with
  a notice (measured divergence, docs/PERF.md round 4).

Usage:
    python tools/convert_torch_checkpoint.py in.pth out.pth
"""

from __future__ import annotations

import argparse
import pickle
import re
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# ConvNeXt-only rules (applied first, only when the state_dict carries
# ConvNeXt markers): timm's `stem` Sequential and block `mlp.fc*` collide
# with the ResNet deep-stem and ViT/Swin mlp mappings, so they are gated.
CONVNEXT_RULES = [
    (re.compile(r"\bstem\.0\."), "stem_conv."),
    (re.compile(r"\bstem\.1\."), "stem_norm."),
    # mmpretrain: downsample_layers.0 = stem, .i>=1 = (LN, 2x2 conv)
    (re.compile(r"\bdownsample_layers\.0\.0\."), "stem_conv."),
    (re.compile(r"\bdownsample_layers\.0\.1\."), "stem_norm."),
    (re.compile(r"\bdownsample_layers\.(\d+)\.0\."), r"downsample\1_norm."),
    (re.compile(r"\bdownsample_layers\.(\d+)\.1\."), r"downsample\1_conv."),
    # mmpretrain blocks are directly indexed under stages.N
    (re.compile(r"\bstages\.(\d+)\.(\d+)\."), r"stage\1_block\2."),
    # timm: stages.N.blocks.M handled by the shared rule below, then:
    (re.compile(r"\bstages\.(\d+)\.blocks\.(\d+)\."), r"stage\1_block\2."),
    (re.compile(r"\bstages\.(\d+)\.downsample\.0\."), r"downsample\1_norm."),
    (re.compile(r"\bstages\.(\d+)\.downsample\.1\."), r"downsample\1_conv."),
    (re.compile(r"\.conv_dw\."), ".dwconv."),
    (re.compile(r"\.depthwise_conv\."), ".dwconv."),
    (re.compile(r"\.pointwise_conv1\."), ".pwconv1."),
    (re.compile(r"\.pointwise_conv2\."), ".pwconv2."),
    (re.compile(r"(stage\d+_block\d+)\.mlp\.fc1\."), r"\1.pwconv1."),
    (re.compile(r"(stage\d+_block\d+)\.mlp\.fc2\."), r"\1.pwconv2."),
]

# PoolFormer-only rules (gated on the `network.N.` Sequential marker):
# upstream (the original poolformer repo / timm / mmpretrain) interleaves
# stages and patch embeds in ONE `network` list — even indices are block
# stages, odd are downsampling embeds; mmpretrain's out-indices norms are
# numbered by network index (norm0/2/4/6), ours by stage (norm0..3).
POOLFORMER_RULES = [
    (re.compile(r"\bpatch_embed\.proj\."), "patch_embed0."),
    (re.compile(r"\bnetwork\.([135])\.proj\."),
     lambda m: f"patch_embed{(int(m.group(1)) + 1) // 2}."),
    (re.compile(r"\bnetwork\.([0246])\.(\d+)\."),
     lambda m: f"stage{int(m.group(1)) // 2}_block{m.group(2)}."),
    (re.compile(r"\bnorm([0246])\."),
     lambda m: f"norm{int(m.group(1)) // 2}."),
    (re.compile(r"\.mlp\.fc1\."), ".fc1."),
    (re.compile(r"\.mlp\.fc2\."), ".fc2."),
]

# MobileNetV3-only rule (gated on the `.linear_conv.` InvertedResidualV3
# marker, which exists in no other family): the reference names every
# stage — stem ConvModule, InvertedResidualV3 blocks, final 1x1 — a
# top-level `layer{i}` (mobilenet_v3.py:139-206; mmseg/mmcv identical);
# ours is one linen list field → `layers_{i}`.  Block internals
# (expand_conv/depthwise_conv/se.conv1/conv2/linear_conv) already share
# names.  Ungated, `layer\d` would collide with the ResNet-family rules.
MOBILENETV3_RULES = [
    (re.compile(r"\blayer(\d+)\."), r"layers_\1."),
]

_MNV3_MARKER = re.compile(r"\.linear_conv\.")

# avg-down residual downsample (ResNeSt, and mmseg ResNet variants saved
# with avg_down=True): Sequential(AvgPool2d, conv, bn) — the conv sits at
# index 1 and the bn at 2 (the pool has no params), unlike the plain
# (conv, bn) layout the generic rules below assume.  Applied only when the
# state_dict structurally proves the layout (a `.downsample.2.` key).
AVGDOWN_RULES = [
    (re.compile(r"\.downsample\.1\."), ".downsample_conv."),
    (re.compile(r"\.downsample\.2\."), ".downsample_bn."),
]

# ordered rename rules (regex, replacement)
RENAME_RULES = [
    # ---- ResNeSt SplAtConv2d (conv2.{conv,bn0,fc1,bn1,fc2}): only the
    # norm names differ; `conv2.bn*` exists in no other family ----
    (re.compile(r"\.conv2\.bn0\."), ".conv2.norm0."),
    (re.compile(r"\.conv2\.bn1\."), ".conv2.norm1."),
    # ---- upstream Swin (timm: layers.N.blocks.M / downsample;
    #      mmseg/mmcv: stages.N.blocks.M, attn.w_msa, ffn.layers) ----
    # these must precede the ViT `blocks.N` rule, which would otherwise
    # mangle the two-level Swin paths
    (re.compile(r"\blayers\.(\d+)\.blocks\.(\d+)\."), r"stage\1_block\2."),
    (re.compile(r"\bstages\.(\d+)\.blocks\.(\d+)\."), r"stage\1_block\2."),
    (re.compile(r"\blayers\.(\d+)\.downsample\."), r"downsample\1."),
    (re.compile(r"\bstages\.(\d+)\.downsample\."), r"downsample\1."),
    (re.compile(r"(stage\d+_block\d+)\.attn\.w_msa\."), r"\1.attn."),
    (re.compile(r"(stage\d+_block\d+)\.ffn\.layers\.0\.0\."), r"\1.fc1."),
    (re.compile(r"(stage\d+_block\d+)\.ffn\.layers\.1\."), r"\1.fc2."),
    (re.compile(r"patch_embed\.norm\."), "patch_embed_norm."),
    # ---- upstream ViT, timm naming (timm.models.vision_transformer) ----
    (re.compile(r"patch_embed\.proj\."), "patch_embed_proj."),
    (re.compile(r"\bblocks\.(\d+)\."), r"block\1."),
    (re.compile(r"\.mlp\.fc1\."), ".fc1."),
    (re.compile(r"\.mlp\.fc2\."), ".fc2."),
    (re.compile(r"^norm\.|(?<=backbone\.)norm\."), "norm1."),
    # ---- upstream ViT, mmseg naming (mmseg VisionTransformer:
    # layers.N.{ln1,ln2}, nn.MultiheadAttention in_proj/out_proj, FFN) ----
    (re.compile(r"patch_embed\.projection\."), "patch_embed_proj."),
    (re.compile(r"\blayers\.(\d+)\.ln1\."), r"block\1.norm1."),
    (re.compile(r"\blayers\.(\d+)\.ln2\."), r"block\1.norm2."),
    (re.compile(r"\blayers\.(\d+)\.attn\.attn\.in_proj_"),
     r"block\1.attn.qkv."),
    (re.compile(r"\blayers\.(\d+)\.attn\.attn\.out_proj\."),
     r"block\1.attn.proj."),
    (re.compile(r"\blayers\.(\d+)\.ffn\.layers\.0\.0\."), r"block\1.fc1."),
    (re.compile(r"\blayers\.(\d+)\.ffn\.layers\.1\."), r"block\1.fc2."),
    (re.compile(r"^ln1\.|(?<=backbone\.)ln1\."), "norm1."),
    # ---- upstream BEiT / MAE (mmseg naming; the timm naming rides the
    # generic blocks.N / mlp.fc rules above) ----
    # direct qkv Linear + q_bias/v_bias/relative_position_bias_table/proj
    # under layers.N.attn (the fused attn.attn.in_proj mmseg-ViT case is
    # consumed by the more specific rules above)
    (re.compile(r"\blayers\.(\d+)\.attn\."), r"block\1.attn."),
    (re.compile(r"\blayers\.(\d+)\.gamma_"), r"block\1.gamma_"),
    # ---- reference HRNet (hrnet.py: stageS.m.{branches,fuse_layers},
    # transitionT ModuleLists of Sequentials) → our stages_{S-2}_{m} /
    # transitions_{T-1} flax trees.  Deeper (chain) patterns first so the
    # shallower ones can never eat a prefix of a chain key. ----
    (re.compile(r"\bstage(\d+)\.(\d+)\.branches\.(\d+)\.(\d+)\."),
     lambda m: (f"stages_{int(m.group(1)) - 2}_{m.group(2)}"
                f".branches_{m.group(3)}.blocks_{m.group(4)}.")),
    (re.compile(r"\bstage(\d+)\.(\d+)\.fuse_layers"
                r"\.(\d+)\.(\d+)\.(\d+)\.([01])\."),
     lambda m: (f"stages_{int(m.group(1)) - 2}_{m.group(2)}.fuse_layers"
                f"_{m.group(3)}_{m.group(4)}_{m.group(5)}"
                f".{'conv' if m.group(6) == '0' else 'bn'}.")),
    (re.compile(r"\bstage(\d+)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.([01])\."),
     lambda m: (f"stages_{int(m.group(1)) - 2}_{m.group(2)}.fuse_layers"
                f"_{m.group(3)}_{m.group(4)}"
                f".{'conv' if m.group(5) == '0' else 'bn'}.")),
    (re.compile(r"\btransition(\d+)\.(\d+)\.(\d+)\.([01])\."),
     lambda m: (f"transitions_{int(m.group(1)) - 1}_{m.group(2)}"
                f"_{m.group(3)}"
                f".{'conv' if m.group(4) == '0' else 'bn'}.")),
    (re.compile(r"\btransition(\d+)\.(\d+)\.([01])\."),
     lambda m: (f"transitions_{int(m.group(1)) - 1}_{m.group(2)}"
                f".{'conv' if m.group(3) == '0' else 'bn'}.")),
    # ---- mmseg BiSeNetV2 (bisenetv2.py): DetailBranch ModuleList of
    # ConvModule Sequentials, SemanticBranch named stages (stage1 =
    # StemBlock, stage2..4 = GELayer Sequentials, stage4_CEBlock),
    # BGALayer's Sequential(dw ConvModule, raw 1x1 Conv2d) pairs ----
    (re.compile(r"\bdetail\.detail_branch\.(\d+)\.(\d+)\."),
     r"detail.stage\1_conv\2."),
    (re.compile(r"\bsemantic\.stage1\.convs\.(\d)\."),
     r"semantic.stem.convs_\1."),
    (re.compile(r"\bsemantic\.stage1\."), "semantic.stem."),
    (re.compile(r"\bsemantic\.stage\d+_CEBlock\.gap\.1\."),
     "semantic.ce.gap_norm."),
    (re.compile(r"\bsemantic\.stage\d+_CEBlock\."), "semantic.ce."),
    (re.compile(r"\bsemantic\.stage(\d+)\.(\d+)\."),
     lambda m: f"semantic.stage{int(m.group(1)) - 1}_ge{m.group(2)}."),
    (re.compile(r"(_ge\d+)\.dwconv\.(\d)\."), r"\1.dwconv_\2."),
    (re.compile(r"(_ge\d+)\.conv2\.0\."), r"\1.conv2."),
    (re.compile(r"(_ge\d+)\.shortcut\.0\.depthwise_conv\."),
     r"\1.shortcut_dw."),
    (re.compile(r"(_ge\d+)\.shortcut\.0\.pointwise_conv\."),
     r"\1.shortcut_pw."),
    (re.compile(r"\bbga\.(detail_dwconv|semantic_dwconv)\.0\."),
     r"bga.\1."),
    (re.compile(r"\bbga\.(detail_dwconv|semantic_dwconv)\.1\."),
     r"bga.\1_pw."),
    (re.compile(r"\bbga\.(detail_down|semantic_conv)\.0\."), r"bga.\1."),
    # ---- mmseg BiSeNetV1 (bisenetv1.py): SpatialPath's named layer{i}
    # ConvModules, ARM's Sequential(pool, ConvModule), FFM's
    # Sequential(ConvModule, Sigmoid) attention, ContextPath's
    # Sequential(pool, ConvModule) gap; the wrapped ResNet rides the
    # generic ResNet rules ----
    (re.compile(r"\bspatial_path\.layer(\d+)\."),
     lambda m: f"spatial_path.layers_{int(m.group(1)) - 1}."),
    (re.compile(r"\.atten_conv_layer\.1\."), ".atten_conv."),
    (re.compile(r"\bffm\.conv_atten\.0\."), "ffm.conv_atten."),
    (re.compile(r"\.gap_conv\.1\."), ".gap_conv."),
    # ---- reference MobileNetV2 (mobilenet_v2.py:131-146; mmseg/mmcv
    # use the identical InvertedResidual naming): layer{i} is a
    # Sequential of blocks whose ConvModule stack is the inner `conv.{k}`
    # Sequential → our stages_{i-1}_{j}.conv_{k} list tree.  The
    # `.conv.{digit}.` chain exists in no ResNet-family key (their convs
    # are the named conv1/conv2/conv3), so this can safely precede the
    # generic residual-stage rule below ----
    (re.compile(r"\blayer(\d+)\.(\d+)\.conv\.(\d+)\."),
     lambda m: (f"stages_{int(m.group(1)) - 1}_{m.group(2)}"
                f".conv_{m.group(3)}.")),
    # ---- reference ICNet (icnet.py:105-130): conv_sub1 is a Sequential
    # of 3 ConvModules → our conv_sub1_{j} list fields ----
    (re.compile(r"\b(conv_sub\d+)\.(\d+)\."), r"\1_\2."),
    # residual stages: layer1.0.conv1 → layer1.blocks_0.conv1
    (re.compile(r"(layer\d+)\.(\d+)\."), r"\1.blocks_\2."),
    # block downsample Sequential → named fields
    (re.compile(r"\.downsample\.0\."), ".downsample_conv."),
    (re.compile(r"\.downsample\.1\."), ".downsample_bn."),
    # FCN head conv stack
    (re.compile(r"\.convs\.(\d+)\."), r".convs_\1."),
    # ASPP / PPM branches: aspp_modules.0 → aspp_modules.branches_0
    # (\b, not \., so ICNet backbone-only state_dicts whose psp_modules
    # sit at the key root convert too)
    (re.compile(r"\b(aspp_modules|psp_modules)\.(\d+)\."),
     r"\1.branches_\2."),
    # PPM branch Sequential(AdaptiveAvgPool2d, ConvModule): drop the `.1`
    (re.compile(r"\bpsp_modules\.(branches_\d+)\.1\."), r"psp_modules.\1."),
    # ASPP image pool Sequential(AdaptiveAvgPool2d, ConvModule)
    (re.compile(r"\.image_pool\.1\."), ".image_pool_conv."),
    # deep stem Sequential (conv,bn,relu)x3 at indices 0,1,3,4,6,7
    # (\b so bare-backbone state_dicts starting at `stem.0.` match too)
    (re.compile(r"\bstem\.0\."), "stem_0."),
    (re.compile(r"\bstem\.1\."), "stem_1."),
    (re.compile(r"\bstem\.3\."), "stem_2."),
    (re.compile(r"\bstem\.4\."), "stem_3."),
    (re.compile(r"\bstem\.6\."), "stem_4."),
    (re.compile(r"\bstem\.7\."), "stem_5."),
    # conv_cat etc. keep their names; module. prefix handled by loader
]


_SWIN_MARKER = re.compile(r"(?:\blayers|\bstages)\.\d+\.blocks\.\d+\.|w_msa")
# timm Swin's single final `norm` normalizes the last stage's output —
# our (and mmseg's) `norm3`; for ViT the same key is the final encoder
# norm, our `norm1`.  Resolved per state_dict, not per key.
_FINAL_NORM = re.compile(r"^norm\.|(?<=backbone\.)norm\.")


_CONVNEXT_MARKER = re.compile(
    r"depthwise_conv|pointwise_conv|\.conv_dw\.|downsample_layers\.")
# mmseg MixVisionTransformer: 4-level layers.N.{0: patch embed, 1.M:
# blocks, 2: out norm}; EfficientMultiheadAttention carries `.attn.sr.`
_MIT_MARKER = re.compile(r"\blayers\.\d+\.1\.\d+\.")


def _convert_mit_key(key: str) -> str:
    """mmseg MixVisionTransformer names → our 1-indexed MiT tree."""
    key = re.sub(r"^module\.", "", key)
    key = re.sub(r"\blayers\.(\d+)\.0\.projection\.",
                 lambda m: f"patch_embed{int(m.group(1)) + 1}_proj.", key)
    key = re.sub(r"\blayers\.(\d+)\.0\.norm\.",
                 lambda m: f"patch_embed{int(m.group(1)) + 1}_norm.", key)
    key = re.sub(
        r"\blayers\.(\d+)\.1\.(\d+)\.",
        lambda m: (f"stage{int(m.group(1)) + 1}"
                   f"_block{int(m.group(2)) + 1}."), key)
    key = re.sub(r"\blayers\.(\d+)\.2\.",
                 lambda m: f"norm{int(m.group(1)) + 1}.", key)
    key = key.replace(".attn.attn.out_proj.", ".attn.proj.")
    key = key.replace(".attn.norm.", ".attn.sr_norm.")
    key = key.replace(".ffn.layers.0.", ".ffn.fc1.")
    key = key.replace(".ffn.layers.1.", ".ffn.pe_conv.")
    key = key.replace(".ffn.layers.4.", ".ffn.fc2.")
    return key


def _to_1x1(arr: np.ndarray) -> np.ndarray:
    out_c, in_c = arr.shape  # torch Linear (out,in) → our (1,1,in,out)
    return np.ascontiguousarray(arr.T).reshape(1, 1, in_c, out_c)


def _convert_mit_state_dict(torch_sd: dict) -> dict:
    """mmseg MiT: fused nn.MultiheadAttention in_proj splits into our q /
    kv 1x1 convs ([k|v] column order = torch's [q;k;v] row packing);
    out_proj becomes the 1x1 proj conv; MixFFN's Conv2d layers and the
    depthwise positional conv ride the generic OIHW→HWIO transpose."""
    out = {}
    for key, value in torch_sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(value.detach().cpu().numpy()
                         if hasattr(value, "detach") else value)
        new_key = _convert_mit_key(key)
        if new_key.endswith(".attn.attn.in_proj_weight"):
            base = new_key[:-len("attn.in_proj_weight")]
            C = arr.shape[1]
            out[base + "q.weight"] = _to_1x1(arr[:C])
            out[base + "kv.weight"] = _to_1x1(arr[C:])
        elif new_key.endswith(".attn.attn.in_proj_bias"):
            base = new_key[:-len("attn.in_proj_bias")]
            C = arr.shape[0] // 3
            out[base + "q.bias"] = np.ascontiguousarray(arr[:C])
            out[base + "kv.bias"] = np.ascontiguousarray(arr[C:])
        elif (new_key.endswith(".attn.proj.weight")
              and arr.ndim == 2):
            out[new_key] = _to_1x1(arr)
        else:
            out[new_key] = convert_tensor(new_key, arr)
    return out


def _geometric_rel_pos_resample(field: np.ndarray,
                                dst_size: int) -> np.ndarray:
    """Resample a (src_size², heads) BEiT relative-position bias field to
    (dst_size², heads) with the upstream geometric-spacing cubic
    interpolation (public BEiT fine-tune recipe, Bao et al. 2022; the
    procedure mmseg applies at checkpoint load).

    The src rows are treated as samples at *geometrically* spaced
    offsets ±(1, 1+q, 1+q+q², …) with the ratio q chosen so the
    outermost sample lands on the dst half-width — the pretrained
    table's outer buckets stretch, the inner ones stay near-unit
    spacing — then a bicubic spline is evaluated at the dst grid's
    integer offsets.  Host-side numpy/scipy: runs once at conversion,
    so the in-model trace-time resample can be bypassed entirely by
    setting ``pretrain_img_size`` to the fine-tune resolution.  (The
    pretrained table's outer buckets stretch; spline knots reproduce
    the stored values exactly wherever src and dst offsets coincide.)
    """
    from scipy import interpolate

    num_rows, heads = field.shape
    src_size = int(round(np.sqrt(num_rows)))
    assert src_size * src_size == num_rows, field.shape
    if src_size == dst_size:
        return field
    # ratio q: 1 + q + … + q^(n-1) spans the dst half-width
    left, right = 1.01, 1.5
    n = src_size // 2
    while right - left > 1e-6:
        q = (left + right) / 2.0
        if (1.0 - q ** n) / (1.0 - q) > dst_size // 2:
            right = q
        else:
            left = q
    dis, cur = [], 1.0
    for i in range(n):
        dis.append(cur)
        cur += q ** (i + 1)
    coords = np.array([-d for d in reversed(dis)] + [0.0] + dis)
    t = dst_size // 2
    dst_coords = np.arange(-t, t + 0.1, 1.0)
    out = np.empty((dst_size * dst_size, heads), np.float32)
    for h in range(heads):
        z = field[:, h].astype(np.float64).reshape(src_size, src_size)
        spline = interpolate.RectBivariateSpline(coords, coords, z,
                                                 kx=3, ky=3)
        out[:, h] = spline(dst_coords, dst_coords).reshape(-1)
    return out


def resample_rel_pos_tables(sd: dict, dst_grid: int) -> dict:
    """Resample every BEiT/MAE ``relative_position_bias_table`` (shape
    ((2g₀-1)² + 3, heads); the 3 trailing cls rows pass through) to a
    ``dst_grid``-patch fine-tune grid, i.e. (2·dst_grid-1)² bias rows."""
    dst_size = 2 * dst_grid - 1
    out = {}
    for key, arr in sd.items():
        if key.endswith("relative_position_bias_table"):
            field, cls_rows = arr[:-3], arr[-3:]
            field = _geometric_rel_pos_resample(np.asarray(field), dst_size)
            arr = np.concatenate([field, np.asarray(cls_rows)], axis=0)
        out[key] = arr
    return out


def convert_key(key: str, swin: bool = False, convnext: bool = False,
                poolformer: bool = False, avg_down: bool = False,
                mobilenetv3: bool = False) -> str:
    key = re.sub(r"^module\.", "", key)
    if swin:
        key = _FINAL_NORM.sub("norm3.", key)
    if convnext:
        for pattern, repl in CONVNEXT_RULES:
            key = pattern.sub(repl, key)
    if poolformer:
        for pattern, repl in POOLFORMER_RULES:
            key = pattern.sub(repl, key)
    if avg_down:
        for pattern, repl in AVGDOWN_RULES:
            key = pattern.sub(repl, key)
    if mobilenetv3:
        for pattern, repl in MOBILENETV3_RULES:
            key = pattern.sub(repl, key)
    for pattern, repl in RENAME_RULES:
        key = pattern.sub(repl, key)
    return key


def convert_tensor(key: str, t) -> np.ndarray:
    arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    if key.endswith(".weight") and arr.ndim == 4:
        return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))  # OIHW→HWIO
    if arr.ndim == 2 and (key.endswith("pwconv1.weight")
                          or key.endswith("pwconv2.weight")):
        # upstream ConvNeXt pointwise layers are Linear (out,in); ours are
        # 1x1 convs with HWIO kernels
        out_c, in_c = arr.shape
        return np.ascontiguousarray(arr.T).reshape(1, 1, in_c, out_c)
    if arr.ndim == 2 and key.endswith(".weight"):
        return np.ascontiguousarray(arr.T)
    return arr


def _convert_twins_state_dict(torch_sd: dict) -> dict:
    """mmseg Twins (PCPVT/SVT) → our ``embed{i}_*`` / ``peg{i}`` /
    ``stage{i}_block{j}`` / ``norm_after{i}`` tree.

    mmseg's GSA layers subclass MiT's EfficientMultiheadAttention, so the
    fused ``attn.attn.in_proj_*`` splits into our q / kv 1x1 convs exactly
    like the MiT converter; LSA (SVT window) layers carry a plain ``qkv``
    Linear and keep Linear layouts.  The two cases are distinguishable
    per key: GSA's out projection arrives as ``.attn.attn.out_proj.``
    (→ 1x1 conv), LSA's as ``.attn.proj.`` (→ Linear)."""
    out = {}
    for key, value in torch_sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(value.detach().cpu().numpy()
                         if hasattr(value, "detach") else value)
        k = re.sub(r"^module\.", "", key)
        k = re.sub(r"\bpatch_embeds\.(\d+)\.projection\.", r"embed\1_conv.",
                   k)
        k = re.sub(r"\bpatch_embeds\.(\d+)\.norm\.", r"embed\1_norm.", k)
        k = re.sub(r"\bposition_encodings\.(\d+)\.proj\.0\.", r"peg\1.proj.",
                   k)
        # FFN internals first: their `.ffn.layers.0.0.` would otherwise be
        # eaten by the two-level block rule below
        k = k.replace(".ffn.layers.0.0.", ".ffn.fc1.")
        k = k.replace(".ffn.layers.1.", ".ffn.fc2.")
        k = re.sub(r"\b(?:layers|blocks)\.(\d+)\.(\d+)\.",
                   r"stage\1_block\2.", k)
        k = re.sub(r"\bnorm_after_stage\.(\d+)\.", r"norm_after\1.", k)
        k = k.replace(".attn.norm.", ".attn.sr_norm.")
        if k.endswith(".attn.attn.in_proj_weight"):
            base = k[:-len("attn.in_proj_weight")]
            C = arr.shape[1]
            out[base + "q.weight"] = _to_1x1(arr[:C])
            out[base + "kv.weight"] = _to_1x1(arr[C:])
        elif k.endswith(".attn.attn.in_proj_bias"):
            base = k[:-len("attn.in_proj_bias")]
            C = arr.shape[0] // 3
            out[base + "q.bias"] = np.ascontiguousarray(arr[:C])
            out[base + "kv.bias"] = np.ascontiguousarray(arr[C:])
        elif k.endswith(".attn.attn.out_proj.weight"):
            out[k.replace(".attn.attn.out_proj.", ".attn.proj.")] = \
                _to_1x1(arr)
        elif k.endswith(".attn.attn.out_proj.bias"):
            out[k.replace(".attn.attn.out_proj.", ".attn.proj.")] = arr
        else:
            out[k] = convert_tensor(k, arr)
    return out


# mmseg MSCAN (SegNeXt): StemConv proj Sequential [conv,bn,gelu,conv,bn],
# OverlapPatchEmbed proj+norm, 1-indexed block{i}.{j} with BN norms,
# MSCA gate convs, Mlp with a nested dwconv module.  A dedicated
# function (not RENAME_RULES) because `.mlp.fc1.` must SURVIVE here —
# the generic ViT rules would strip the `mlp.` prefix.
_MSCAN_MARKER = re.compile(r"spatial_gating_unit")


def _convert_mscan_key(key: str) -> str:
    key = re.sub(r"^module\.", "", key)
    key = re.sub(r"\bpatch_embed1\.proj\.0\.", "stem_conv1.", key)
    key = re.sub(r"\bpatch_embed1\.proj\.1\.", "patch_embeds_0_1.", key)
    key = re.sub(r"\bpatch_embed1\.proj\.3\.", "stem_conv2.", key)
    key = re.sub(r"\bpatch_embed1\.proj\.4\.", "patch_embeds_0_3.", key)
    key = re.sub(r"\bpatch_embed(\d+)\.proj\.",
                 lambda m: f"embed{int(m.group(1)) - 1}_conv.", key)
    key = re.sub(r"\bpatch_embed(\d+)\.norm\.",
                 lambda m: f"patch_embeds_{int(m.group(1)) - 1}_1.", key)
    key = re.sub(r"\bblock(\d+)\.(\d+)\.",
                 lambda m: (f"stage{int(m.group(1)) - 1}"
                            f"_block{m.group(2)}."), key)
    key = key.replace(".mlp.dwconv.dwconv.", ".mlp.dwconv.")
    # per-stage out LayerNorms are 1-indexed upstream; head keys keep
    # their own norms (anchored to the key root / backbone prefix)
    key = re.sub(r"(^|(?<=backbone\.))norm(\d+)\.",
                 lambda m: f"norm{int(m.group(2)) - 1}.", key)
    return key


def _convert_mscan_state_dict(torch_sd: dict) -> dict:
    out = {}
    for key, value in torch_sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        k = _convert_mscan_key(key)
        out[k] = convert_tensor(k, value)
    return out


_MF_HEAD_MARKER = re.compile(
    r"transformer_decoder\.|pixel_decoder\.|\bquery_embed\.|\bquery_feat\."
    r"|\blevel_embed\.|\bcls_embed\.|\bmask_embed\.")


def _convert_maskformer_head_sd(torch_sd: dict) -> dict:
    """mmseg/mmdet MaskFormerHead / Mask2FormerHead → our head tree.

    The fused ``attentions.{0,1}.attn.in_proj`` splits into
    q/k/v_proj Linears.  Both upstream layer types pair attentions.0
    with norms.0 and attentions.1 with norms.1 — only the self/cross
    ROLES swap (DETR order for MaskFormer, cross-first for Mask2Former,
    detected via ``query_feat``), which matches our ``layerN`` field
    names exactly.  MaskFormer's base FPN ``PixelDecoder``
    (lateral_convs/output_convs) maps onto our ``lateral{i}/output{i}``;
    Mask2Former's MSDeformAttnPixelDecoder weights have no counterpart
    (the FPN divergence is measured in docs/PERF.md) and are DROPPED
    with a count — backbone + transformer decoder + embeds still load.
    """
    mask2former = any("query_feat" in k for k in torch_sd)
    a0, a1 = (("cross_attn", "self_attn") if mask2former
              else ("self_attn", "cross_attn"))
    out = {}
    dropped = 0
    for key, value in torch_sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        k = re.sub(r"^module\.", "", key)
        if "pixel_decoder." in k:
            if mask2former:        # MSDeformAttn encoder: no counterpart
                dropped += 1
                continue
            k = re.sub(r"pixel_decoder\.lateral_convs\.(\d+)\.",
                       r"pixel_decoder.lateral\1.", k)
            k = re.sub(r"pixel_decoder\.output_convs\.(\d+)\.",
                       r"pixel_decoder.output\1.", k)
        arr = np.asarray(value.detach().cpu().numpy()
                         if hasattr(value, "detach") else value)
        k = re.sub(r"transformer_decoder\.layers\.(\d+)\.attentions\.0\.",
                   lambda m: f"layer{m.group(1)}.{a0}.", k)
        k = re.sub(r"transformer_decoder\.layers\.(\d+)\.attentions\.1\.",
                   lambda m: f"layer{m.group(1)}.{a1}.", k)
        k = re.sub(r"transformer_decoder\.layers\.(\d+)\.norms\.(\d)\.",
                   lambda m: f"layer{m.group(1)}.norm{int(m.group(2)) + 1}.",
                   k)
        k = re.sub(r"transformer_decoder\.layers\.(\d+)\.ffns\.0\."
                   r"layers\.0\.0\.",
                   lambda m: f"layer{m.group(1)}.ffn_fc1.", k)
        k = re.sub(r"transformer_decoder\.layers\.(\d+)\.ffns\.0\."
                   r"layers\.1\.",
                   lambda m: f"layer{m.group(1)}.ffn_fc2.", k)
        k = k.replace("transformer_decoder.post_norm.", "decoder_norm.")
        k = re.sub(r"\bmask_embed\.([024])\.",
                   lambda m: f"mask_embed{int(m.group(1)) // 2}.", k)
        if k.endswith(".attn.in_proj_weight"):
            base = k[:-len("attn.in_proj_weight")]
            C = arr.shape[1]
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                out[base + name + ".weight"] = np.ascontiguousarray(
                    arr[i * C:(i + 1) * C].T)
            continue
        if k.endswith(".attn.in_proj_bias"):
            base = k[:-len("attn.in_proj_bias")]
            C = arr.shape[0] // 3
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                out[base + name + ".bias"] = np.ascontiguousarray(
                    arr[i * C:(i + 1) * C])
            continue
        k = k.replace(".attn.out_proj.", ".out_proj.")
        # bare-param embeddings: torch nn.Embedding .weight, ours a bare
        # (rows, C) param — same layout, NO Linear transpose
        m = re.search(r"\b(query_embed|query_feat|level_embed)\.weight$", k)
        if m:
            out[k[:-len(".weight")]] = arr
            continue
        out[k] = convert_tensor(k, arr)
    if dropped:
        print(f"note: dropped {dropped} MSDeformAttn pixel-decoder tensors "
              "(this framework ships an FPN pixel decoder for Mask2Former "
              "- docs/PERF.md round 4); the pixel decoder needs training "
              "or its own initialization")
    return out


def convert_state_dict(torch_sd: dict) -> dict:
    if any("transformer_decoder." in k for k in torch_sd):
        head = {k: v for k, v in torch_sd.items()
                if _MF_HEAD_MARKER.search(k)}
        rest = {k: v for k, v in torch_sd.items()
                if not _MF_HEAD_MARKER.search(k)}
        out = convert_state_dict(rest)    # backbone rides its own rules
        out.update(_convert_maskformer_head_sd(head))
        return out
    if any("position_encodings." in k for k in torch_sd):
        return _convert_twins_state_dict(torch_sd)
    if any(_MSCAN_MARKER.search(k) for k in torch_sd):
        return _convert_mscan_state_dict(torch_sd)
    if any(_MIT_MARKER.search(k) for k in torch_sd) and \
            any(".attn.sr." in k or ".ffn.layers." in k for k in torch_sd):
        return _convert_mit_state_dict(torch_sd)
    out = {}
    # MNv3's InvertedResidualV3 and BiSeNetV2's GELayer shortcut also
    # carry `depthwise_conv`/`pointwise_conv` keys, so their markers
    # must veto the ConvNeXt gate (linear_conv / detail_branch exist in
    # no ConvNeXt checkpoint)
    mobilenetv3 = any(_MNV3_MARKER.search(k) for k in torch_sd)
    bisenetv2 = any("detail_branch" in k for k in torch_sd)
    convnext = not mobilenetv3 and not bisenetv2 and any(
        _CONVNEXT_MARKER.search(k) for k in torch_sd)
    swin = not convnext and any(_SWIN_MARKER.search(k) for k in torch_sd)
    poolformer = any(re.search(r"\bnetwork\.\d+\.", k) for k in torch_sd)
    avg_down = any(".downsample.2." in k for k in torch_sd)
    for key, value in torch_sd.items():
        if key.endswith(("num_batches_tracked", "relative_position_index",
                         "attn_mask", ".attn.k_bias")):
            # buffers our modules derive statically; timm BEiT's k_bias
            # is a registered all-zeros buffer (q/v-only bias layout)
            continue
        # transpose decisions use the CONVERTED key so fused projections
        # that torch names `in_proj_weight` (→ `qkv.weight`) transpose too
        new_key = convert_key(key, swin=swin, convnext=convnext,
                              poolformer=poolformer, avg_down=avg_down,
                              mobilenetv3=mobilenetv3)
        out[new_key] = convert_tensor(new_key, value)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src", type=Path, help="torch checkpoint (.pth)")
    parser.add_argument("dst", type=Path, help="output checkpoint path")
    parser.add_argument("--rel-pos-grid", type=int, default=None,
                        help="BEiT/MAE: resample every relative-position "
                             "bias table to this fine-tune patch grid "
                             "(e.g. 40 for 640px/patch16) with upstream's "
                             "geometric-spacing interpolation; then set "
                             "pretrain_img_size = grid*patch_size in the "
                             "network config so no trace-time resample "
                             "runs")
    args = parser.parse_args()

    import torch
    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    metadata = {}
    state_dict = ckpt
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        state_dict = ckpt["state_dict"]
        metadata = ckpt.get("metadata", ckpt.get("meta", {})) or {}

    converted = convert_state_dict(state_dict)
    if args.rel_pos_grid:
        converted = resample_rel_pos_tables(converted, args.rel_pos_grid)
    payload = {"metadata": {**metadata,
                            "converted_from": str(args.src),
                            "converter": "convert_torch_checkpoint.py"},
               "state_dict": converted}
    args.dst.parent.mkdir(parents=True, exist_ok=True)
    with open(args.dst, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    print(f"converted {len(converted)} tensors → {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
