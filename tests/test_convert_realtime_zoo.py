"""Converter round-trips for the realtime zoo families with circulating
upstream (mmseg-naming) weights: SegNeXt/MSCAN, PIDNet, STDC, DDRNet,
BiSeNetV1/V2 (VERDICT r4 item 2b).

Same leaf-for-leaf pattern as ``test_convert_zoo_families.py``:
inverse-map our randomly initialized tree into the upstream naming,
convert, strict-load, compare every leaf, then run the module.
"""

import re
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from test_convert_zoo_families import _leaves, _roundtrip, _t  # noqa: E402

from image_segmentation_lab_tpu.core.fileio import load_python_config
from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

REPO = Path(__file__).resolve().parents[1]


def _build(cfg_path, hw=64):
    cfg = load_python_config(REPO / cfg_path)["model"]["backbone"]
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.zeros((1, hw, hw, 3))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x)
    return m, v, x


# ------------------------------------------------------ SegNeXt / MSCAN

def test_mscan_checkpoint_roundtrips(tmp_path):
    m, v, x = _build("configs/network/segnext/segnext_mscan-t.py")
    flat = _leaves(m, v)
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = re.sub(r"\bstem_conv1\.", "patch_embed1.proj.0.", tk)
        tk = re.sub(r"\bpatch_embeds_0_1\.", "patch_embed1.proj.1.", tk)
        tk = re.sub(r"\bstem_conv2\.", "patch_embed1.proj.3.", tk)
        tk = re.sub(r"\bpatch_embeds_0_3\.", "patch_embed1.proj.4.", tk)
        tk = re.sub(r"\bembed(\d+)_conv\.",
                    lambda mm: f"patch_embed{int(mm.group(1)) + 1}.proj.",
                    tk)
        tk = re.sub(r"\bpatch_embeds_(\d+)_1\.",
                    lambda mm: f"patch_embed{int(mm.group(1)) + 1}.norm.",
                    tk)
        tk = re.sub(r"\bstage(\d+)_block(\d+)\.",
                    lambda mm: f"block{int(mm.group(1)) + 1}.{mm.group(2)}.",
                    tk)
        tk = tk.replace(".mlp.dwconv.", ".mlp.dwconv.dwconv.")
        tk = re.sub(r"^norm(\d+)\.",
                    lambda mm: f"norm{int(mm.group(1)) + 1}.", tk)
        sd[tk] = _t(arr, tk)
    _roundtrip(m, v, flat, sd, tmp_path, run_input=x)


# ---------------------------------------------------------- BiSeNetV2

def test_bisenetv2_checkpoint_roundtrips(tmp_path):
    m, v, x = _build("configs/network/bisenet/bisenetv2_fcn.py", hw=128)
    flat = _leaves(m, v)
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = re.sub(r"\bdetail\.stage(\d+)_conv(\d+)\.",
                    r"detail.detail_branch.\1.\2.", tk)
        tk = re.sub(r"\bsemantic\.stem\.convs_(\d)\.",
                    r"semantic.stage1.convs.\1.", tk)
        tk = re.sub(r"\bsemantic\.stem\.", "semantic.stage1.", tk)
        tk = re.sub(r"\bsemantic\.ce\.gap_norm\.",
                    "semantic.stage4_CEBlock.gap.1.", tk)
        tk = re.sub(r"\bsemantic\.ce\.", "semantic.stage4_CEBlock.", tk)
        tk = re.sub(r"\bsemantic\.stage(\d+)_ge(\d+)\.",
                    lambda mm: (f"semantic.stage{int(mm.group(1)) + 1}"
                                f".{mm.group(2)}."), tk)
        tk = re.sub(r"\.dwconv_(\d)\.", r".dwconv.\1.", tk)
        tk = re.sub(r"(\.\d+)\.conv2\.", r"\1.conv2.0.", tk)
        tk = tk.replace(".shortcut_dw.", ".shortcut.0.depthwise_conv.")
        tk = tk.replace(".shortcut_pw.", ".shortcut.0.pointwise_conv.")
        tk = re.sub(r"\bbga\.(detail_dwconv|semantic_dwconv)_pw\.",
                    r"bga.\1.1.", tk)
        tk = re.sub(r"\bbga\.(detail_dwconv|semantic_dwconv)\.(?!1\.)",
                    r"bga.\1.0.", tk)
        tk = re.sub(r"\bbga\.(detail_down|semantic_conv)\.", r"bga.\1.0.",
                    tk)
        sd[tk] = _t(arr, tk)
    _roundtrip(m, v, flat, sd, tmp_path, run_input=x)


# ---------------------------------------------------------- BiSeNetV1

def test_bisenetv1_checkpoint_roundtrips(tmp_path):
    m, v, x = _build("configs/network/bisenet/bisenetv1_r18.py", hw=128)
    flat = _leaves(m, v)
    sd = {}
    for key, arr in flat.items():
        tk = key
        tk = re.sub(r"\bspatial_path\.layers_(\d)\.",
                    lambda mm: f"spatial_path.layer{int(mm.group(1)) + 1}.",
                    tk)
        tk = tk.replace(".atten_conv.", ".atten_conv_layer.1.")
        tk = tk.replace("ffm.conv_atten.", "ffm.conv_atten.0.")
        tk = tk.replace(".gap_conv.", ".gap_conv.1.")
        # wrapped ResNet-18: reference/mmseg residual naming
        tk = re.sub(r"\blayer(\d)\.blocks_(\d+)\.", r"layer\1.\2.", tk)
        tk = tk.replace(".downsample_conv.", ".downsample.0.")
        tk = tk.replace(".downsample_bn.", ".downsample.1.")
        sd[tk] = _t(arr, tk)
    _roundtrip(m, v, flat, sd, tmp_path, run_input=x)
