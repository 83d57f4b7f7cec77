"""Torch-checkpoint converter: a reference-style state_dict loaded through
the converter must reproduce the torch model's outputs exactly."""

import pickle
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from convert_torch_checkpoint import convert_state_dict  # noqa: E402

from test_torch_parity_e2e import TorchTwin, jax_cfg

from image_segmentation_lab_tpu.core.initialize import load_checkpoint
from image_segmentation_lab_tpu.models.builder import build_segmentor


def reference_style_state_dict(tm: TorchTwin) -> dict:
    """Rename TorchTwin keys into the reference lab's naming scheme."""
    sd = {}
    for k, v in tm.state_dict().items():
        k = "backbone." + k if not k.startswith(("head_", "conv_seg")) else k
        k = k.replace("head_conv.", "decode_head.convs.0.conv.")
        k = k.replace("head_bn.", "decode_head.convs.0.bn.")
        k = k.replace("conv_seg.", "decode_head.conv_seg.")
        k = k.replace(".down.0.", ".downsample.0.")
        k = k.replace(".down.1.", ".downsample.1.")
        sd[k] = v
    return sd


def test_converted_checkpoint_reproduces_torch_outputs(tmp_path, rng):
    torch.manual_seed(0)
    tm = TorchTwin()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    tm.eval()

    converted = convert_state_dict(reference_style_state_dict(tm))
    path = tmp_path / "converted.pth"
    with open(path, "wb") as f:
        pickle.dump({"metadata": {}, "state_dict": converted}, f)

    model = build_segmentor(jax_cfg())
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.asarray(x), method="encode_decode")
    variables, _ = load_checkpoint(variables, path, strict=True, logger=None)

    out = model.apply(variables, jnp.asarray(x), method="encode_decode")
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)
