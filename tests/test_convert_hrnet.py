"""Reference-HRNet checkpoint conversion: a torch state_dict in the
reference lab's HRNet naming (/root/reference/models/backbones/hrnet.py —
``stageS.m.branches.i.n``, ``fuse_layers.i.j[.k].{0,1}``,
``transitionT.i[.j].{0,1}`` Sequential indices) must round-trip exactly
onto this framework's ``stages_{S-2}_{m}`` / ``transitions_{T-1}`` flax
tree, following the leaf-for-leaf pattern of ``test_convert_vit.py``:
inverse-map our randomly initialized params (+ BN batch_stats) into the
torch naming, convert, strict-load, compare every leaf.
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
from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

# stage3 has 2 modules so the m index is exercised; BOTTLENECK stage1
# exercises the in-branch downsample Sequential
EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(1,), num_channels=(8,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(2, 2), num_channels=(8, 16)),
    stage3=dict(num_modules=2, num_branches=3, block="BASIC",
                num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)))


def _hrnet_and_leaves():
    m = build_module_from_cfg(
        dict(type="HRNet", extra=EXTRA,
             norm_cfg=dict(type="BN", requires_grad=True)), BACKBONE)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    flat = {}
    for coll in ("params", "batch_stats"):
        for k, le in flax.traverse_util.flatten_dict(v[coll]).items():
            flat[".".join(k)] = np.asarray(le)
    return m, v, flat


def _reference_key(key: str) -> str:
    """Our flax path → the reference lab's torch naming."""
    tk = key
    tk = re.sub(r"\bstages_(\d+)_(\d+)\.",
                lambda m: f"stage{int(m.group(1)) + 2}.{m.group(2)}.", tk)
    tk = re.sub(r"\bbranches_(\d+)\.blocks_(\d+)\.", r"branches.\1.\2.", tk)
    tk = re.sub(r"\bfuse_layers_(\d+)_(\d+)_(\d+)\.(conv|bn)\.",
                lambda m: (f"fuse_layers.{m.group(1)}.{m.group(2)}"
                           f".{m.group(3)}"
                           f".{0 if m.group(4) == 'conv' else 1}."), tk)
    tk = re.sub(r"\bfuse_layers_(\d+)_(\d+)\.(conv|bn)\.",
                lambda m: (f"fuse_layers.{m.group(1)}.{m.group(2)}"
                           f".{0 if m.group(3) == 'conv' else 1}."), tk)
    tk = re.sub(r"\btransitions_(\d+)_(\d+)_(\d+)\.(conv|bn)\.",
                lambda m: (f"transition{int(m.group(1)) + 1}.{m.group(2)}"
                           f".{m.group(3)}"
                           f".{0 if m.group(4) == 'conv' else 1}."), tk)
    tk = re.sub(r"\btransitions_(\d+)_(\d+)\.(conv|bn)\.",
                lambda m: (f"transition{int(m.group(1)) + 1}.{m.group(2)}"
                           f".{0 if m.group(3) == 'conv' else 1}."), tk)
    tk = re.sub(r"\blayer1\.blocks_(\d+)\.", r"layer1.\1.", tk)
    tk = tk.replace(".downsample_conv.", ".downsample.0.")
    tk = tk.replace(".downsample_bn.", ".downsample.1.")
    return tk


def test_reference_hrnet_checkpoint_roundtrips(tmp_path):
    m, v, flat = _hrnet_and_leaves()
    sd = {}
    for key, arr in flat.items():
        tk = _reference_key(key)
        if arr.ndim == 4:                       # HWIO → OIHW
            arr = arr.transpose(3, 2, 0, 1)
        sd["backbone." + tk] = torch.from_numpy(np.ascontiguousarray(arr))
        # the reference's BN buffers carry num_batches_tracked too
        if tk.endswith("running_var"):
            sd["backbone." + tk.replace("running_var",
                                        "num_batches_tracked")] = \
                torch.zeros((), dtype=torch.long)
    converted = convert_state_dict(sd)
    path = tmp_path / "hrnet.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)

    zeroed = jax.tree.map(jnp.zeros_like, v)
    loaded, _ = load_checkpoint(zeroed, path, strict=True, logger=None,
                                revise_keys=((r"^backbone\.", ""),))
    got = {}
    for coll in ("params", "batch_stats"):
        for k, le in flax.traverse_util.flatten_dict(loaded[coll]).items():
            got[".".join(k)] = np.asarray(le)
    assert set(got) == set(flat)
    for key in flat:
        np.testing.assert_array_equal(got[key], flat[key], err_msg=key)

    outs = m.apply(loaded, jnp.zeros((1, 64, 64, 3)))
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_hrnet_key_mapping_spotchecks():
    """The chain/simple Sequential ambiguity is resolved by depth: a
    4-index transition key must NEVER be eaten by the 3-index rule."""
    from convert_torch_checkpoint import convert_key
    assert convert_key("transition1.2.0.0.weight") == \
        "transitions_0_2_0.conv.weight"
    assert convert_key("transition1.0.0.weight") == \
        "transitions_0_0.conv.weight"
    assert convert_key("transition2.1.1.running_mean") == \
        "transitions_1_1.bn.running_mean"
    assert convert_key("stage3.1.fuse_layers.2.0.1.0.weight") == \
        "stages_1_1.fuse_layers_2_0_1.conv.weight"
    assert convert_key("stage2.0.fuse_layers.0.1.1.bias") == \
        "stages_0_0.fuse_layers_0_1.bn.bias"
    assert convert_key("stage4.0.branches.3.1.conv2.weight") == \
        "stages_2_0.branches_3.blocks_1.conv2.weight"
