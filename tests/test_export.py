"""AOT export/serving tests (core/inference/export.py + tools/export_model.py).

The artifact contract: a serialized StableHLO file reproduces the live
model's inference probabilities with no model code, config or checkpoint —
weights ride inside the program as constants.
"""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_segmentation_lab_tpu.core.inference.export import (
    export_inference, load_exported, save_exported, serve_fn)
from image_segmentation_lab_tpu.models.builder import build_segmentor

REPO = Path(__file__).resolve().parents[1]


def tiny_cfg(test_cfg=None):
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=2,
                      strides=(1, 2), dilations=(1, 1), out_indices=(1,),
                      base_channels=8, stem_channels=8),
        decode_head=dict(type="FCNHead", in_channels=16, in_index=0,
                         channels=8, num_convs=1, concat_input=False,
                         num_classes=3, dropout_ratio=0,
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=test_cfg or dict(mode="whole"))


def _build(test_cfg=None, hw=(32, 32)):
    model = build_segmentor(tiny_cfg(test_cfg))
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, method="encode_decode")
    return model, variables


def test_export_roundtrip_whole(tmp_path):
    model, variables = _build()
    exported = export_inference(model, variables, input_hw=(32, 32),
                                batch=2, platforms=("cpu",))
    path = save_exported(exported, tmp_path / "m")
    assert path.suffix == ".stablehlo" and path.stat().st_size > 0

    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    want = np.asarray(model.apply(variables, x, method="inference"))
    got = np.asarray(load_exported(path).call(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # probabilities, not logits: softmax already applied
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-4)


def test_export_roundtrip_slide(tmp_path):
    """Slide mode exports the full gather→decode→stitch program."""
    model, variables = _build(
        dict(mode="slide", crop_size=(16, 16), stride=(8, 8)))
    exported = export_inference(model, variables, input_hw=(32, 32),
                                batch=1, platforms=("cpu",))
    fn = serve_fn(save_exported(exported, tmp_path / "slide"))
    x = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    want = np.asarray(model.apply(variables, x, method="inference"))
    np.testing.assert_allclose(np.asarray(fn(x)), want,
                               rtol=1e-5, atol=1e-6)


def test_export_symbolic_batch(tmp_path):
    """batch=None → one artifact serves any batch size."""
    model, variables = _build()
    exported = export_inference(model, variables, input_hw=(32, 32),
                                batch=None, platforms=("cpu",))
    fn = serve_fn(save_exported(exported, tmp_path / "poly"))
    for b in (1, 3):
        x = np.random.RandomState(b).rand(b, 32, 32, 3).astype(np.float32)
        want = np.asarray(model.apply(variables, x, method="inference"))
        np.testing.assert_allclose(np.asarray(fn(x)), want,
                                   rtol=1e-5, atol=1e-6)


def test_export_symbolic_batch_rejects_slide():
    model, variables = _build(
        dict(mode="slide", crop_size=(16, 16), stride=(8, 8)))
    with pytest.raises(ValueError, match="whole mode only"):
        export_inference(model, variables, input_hw=(32, 32), batch=None,
                         platforms=("cpu",))


def test_export_cli_end_to_end(tmp_path):
    """Config → (random-init) export → validate against the live model,
    through the actual CLI."""
    cfg = tmp_path / "net.py"
    cfg.write_text(
        "model = dict(\n"
        "    type='EncoderDecoder',\n"
        "    backbone=dict(type='ResNet', depth=18, num_stages=2,\n"
        "                  strides=(1, 2), dilations=(1, 1),\n"
        "                  out_indices=(1,), base_channels=8,\n"
        "                  stem_channels=8),\n"
        "    decode_head=dict(type='FCNHead', in_channels=16, in_index=0,\n"
        "                     channels=8, num_convs=1, concat_input=False,\n"
        "                     num_classes=3, dropout_ratio=0,\n"
        "                     loss_decode=dict(type='CrossEntropyLoss')),\n"
        "    test_cfg=dict(mode='whole'))\n")
    out = tmp_path / "artifact.stablehlo"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools/export_model.py"),
         "--network-cfg", str(cfg), "--out", str(out),
         "--input-size", "32", "32", "--batch", "any",
         "--platforms", "cpu", "--device", "cpu", "--validate"],
        capture_output=True, text=True, cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "validate OK" in r.stdout
    assert out.exists() and out.stat().st_size > 0


def test_export_panoptic_program(tmp_path):
    """The mask-classification panoptic post-processing is static-shaped
    and AOT-exports like the dense path: the artifact returns the
    (query_id, labels, keep) triple bit-identical to the live model."""
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                      out_indices=(0, 1, 2, 3), base_channels=8,
                      stem_channels=8),
        decode_head=dict(type="MaskFormerHead",
                         in_channels=[8, 16, 32, 64],
                         in_index=(0, 1, 2, 3),
                         input_transform="multiple_select",
                         channels=16, feat_channels=16, num_queries=8,
                         num_decoder_layers=2, num_heads=2,
                         feedforward_channels=32, dropout_ratio=0.0,
                         num_classes=3),
        test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, method="encode_decode")

    exported = export_inference(model, variables, input_hw=(32, 32),
                                batch=2, platforms=("cpu",),
                                method="panoptic")
    path = save_exported(exported, tmp_path / "pan")
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    got = load_exported(path).call(x)
    want = model.apply(variables, x, method="panoptic")
    assert len(got) == 3
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    qid = np.asarray(got[0])
    assert qid.shape == (2, 32, 32) and qid.min() >= -1 and qid.max() < 8
