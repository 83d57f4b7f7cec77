"""Instance-result surface (STATUS item 43 closed CLI-side): COCO
uncompressed RLE encode (pycocotools convention, hand goldens +
round-trip), the segmentor ``instances`` method, and the
``val.py --instances`` CLI end-to-end with a mask-classification head.
"""

import json
import os
import pickle
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.core.evaluation import (
    instances_to_json, mask_to_rle, rle_to_mask)

REPO = Path(__file__).resolve().parents[1]


def test_rle_pycocotools_convention():
    """Column-major order; counts start with the ZERO run (0 first when
    pixel (0,0) is set).  mask [[1,0],[1,1]] -> F-order [1,1,0,1] ->
    counts [0,2,1,1]."""
    rle = mask_to_rle(np.array([[1, 0], [1, 1]], bool))
    assert rle == {"size": [2, 2], "counts": [0, 2, 1, 1]}
    rle = mask_to_rle(np.zeros((2, 3), bool))
    assert rle == {"size": [2, 3], "counts": [6]}
    rle = mask_to_rle(np.ones((2, 2), bool))
    assert rle == {"size": [2, 2], "counts": [0, 4]}


def test_rle_roundtrip_random():
    r = np.random.RandomState(0)
    for _ in range(5):
        mask = r.rand(13, 17) > 0.5
        np.testing.assert_array_equal(rle_to_mask(mask_to_rle(mask)), mask)


def test_instances_to_json_filters_and_sorts():
    labels = np.array([2, 0, 1, 1])
    scores = np.array([0.3, 0.9, 0.0, 0.5])     # q2 gated (score 0)
    masks = np.zeros((4, 4, 4), bool)
    masks[0, 0, 0] = masks[1, 1, 1] = masks[2, 2, 2] = True
    # q3 scores 0.5 but has an EMPTY mask -> dropped
    out = instances_to_json(labels, scores, masks)
    assert [o["label"] for o in out] == [0, 2]   # sorted by score desc
    assert out[0]["score"] == pytest.approx(0.9)
    assert rle_to_mask(out[0]["segmentation"])[1, 1]


MASKFORMER_CFG = """
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='ResNetV1c', depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), dilations=(1, 1, 1, 1),
                  strides=(1, 2, 2, 2),
                  norm_cfg=dict(type='BN', requires_grad=True),
                  base_channels=8, stem_channels=8),
    decode_head=dict(type='MaskFormerHead', in_channels=[8, 16, 32, 64],
                     in_index=(0, 1, 2, 3),
                     input_transform='multiple_select',
                     channels=16, feat_channels=16, num_queries=8,
                     num_decoder_layers=2, num_heads=2,
                     feedforward_channels=32, dropout_ratio=0.0,
                     num_classes=2),
    test_cfg=dict(mode='whole'))
"""

PIPELINE_YAML = """\
__version__: 2.0.6
transform:
  __class_fullname__: Compose
  p: 1.0
  transforms:
  - __class_fullname__: Resize
    height: 32
    width: 32
    interpolation: 1
    mask_interpolation: 0
    p: 1.0
  - __class_fullname__: Normalize
    max_pixel_value: 255.0
    mean: [0.485, 0.456, 0.406]
    std: [0.229, 0.224, 0.225]
    p: 1.0
  - __class_fullname__: ToTensorV2
    p: 1.0
"""

DATASET_CFG = """
_pipe = {pipe!r}
dataset = dict(
    train=dict(type='SyntheticDataset', length=4, image_size=(32, 32),
               pipeline=_pipe),
    val=dict(type='SyntheticDataset', length=4, image_size=(32, 32),
             seed=1, return_ori_seg_gt=True, pipeline=_pipe),
    test=dict(type='SyntheticDataset', length=4, image_size=(32, 32),
              seed=2, pipeline=_pipe))
"""


def test_segmentor_instances_method_and_dense_rejection():
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    ns = {}
    exec(MASKFORMER_CFG, ns)
    model = build_segmentor(ns["model"])
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, method="encode_decode")
    labels, scores, masks = model.apply(v, x, method="instances")
    assert labels.shape == (2, 8) and scores.shape == (2, 8)
    assert masks.shape == (2, 8, 32, 32) and masks.dtype == jnp.bool_

    dense = build_segmentor(dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=2,
                      strides=(1, 2), dilations=(1, 1), out_indices=(1,),
                      base_channels=8, stem_channels=8),
        decode_head=dict(type="FCNHead", in_channels=16, in_index=0,
                         channels=8, num_convs=1, concat_input=False,
                         num_classes=3, dropout_ratio=0),
        test_cfg=dict(mode="whole")))
    dv = dense.init(jax.random.PRNGKey(0), x, method="encode_decode")
    with pytest.raises(AttributeError, match="dense decode head"):
        dense.apply(dv, x, method="instances")


@pytest.mark.filterwarnings("ignore")
def test_val_cli_instances(tmp_path):
    """Checkpoint an (untrained) tiny MaskFormer and run
    `val.py --instances`: instances.json appears with the COCO-RLE
    schema (quality is irrelevant — this pins the surface)."""
    import flax

    from image_segmentation_lab_tpu.models.builder import build_segmentor

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    net_cfg = tmp_path / "maskformer_tiny.py"
    net_cfg.write_text(MASKFORMER_CFG)
    pipe = tmp_path / "pipe.yaml"
    pipe.write_text(PIPELINE_YAML)
    ds_cfg = tmp_path / "ds.py"
    ds_cfg.write_text(DATASET_CFG.format(pipe=str(pipe)))

    ns = {}
    exec(MASKFORMER_CFG, ns)
    model = build_segmentor(ns["model"])
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   method="encode_decode")
    sd = {}
    for coll in v:
        for k, le in flax.traverse_util.flatten_dict(v[coll]).items():
            sd[".".join(k)] = np.asarray(le)
    ckpt = tmp_path / "init.pth"
    with open(ckpt, "wb") as f:
        pickle.dump({"metadata": {"epoch": 0}, "state_dict": sd}, f)

    r = subprocess.run(
        [sys.executable, "val.py", "--network-cfg", str(net_cfg),
         "--dataset-cfg", str(ds_cfg), "--checkpoint", str(ckpt),
         "--work-dir", str(tmp_path / "runs"), "--device", "cpu",
         "--batch-size", "2", "--num-workers", "0", "--instances",
         "--score"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, (r.stdout[-4000:], r.stderr[-4000:])
    assert "instances:" in r.stdout
    # --score: the COCO-style mask mAP line + results.json field
    assert "instance AP: mAP=" in r.stdout
    results = json.loads(
        (tmp_path / "runs" / "val" / "exp" / "results.json").read_text())
    ap = results["instance_ap"]
    assert set(ap) >= {"mAP", "AP50", "AP75", "per_class_AP", "num_gt"}
    assert all(v is None or 0.0 <= v <= 1.0 for v in ap["per_class_AP"])

    records = json.loads(
        (tmp_path / "runs" / "val" / "exp" / "instances.json").read_text())
    assert len(records) == 4
    for rec in records:
        for inst in rec["instances"]:
            assert set(inst) == {"label", "score", "segmentation"}
            assert inst["segmentation"]["size"] == [32, 32]
            m = rle_to_mask(inst["segmentation"])
            assert m.shape == (32, 32)
