"""Bit-parity of resize with torch.nn.functional.interpolate."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.utils.ops import resize


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)), ((17, 13), (64, 64)), ((32, 32), (7, 5)),
    ((5, 5), (5, 5)), ((1, 1), (4, 4)),
])
@pytest.mark.parametrize("align_corners", [False, True])
def test_bilinear_parity(rng, in_hw, out_hw, align_corners):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    out = resize(jnp.asarray(x), size=out_hw, mode="bilinear",
                 align_corners=align_corners, warning=False)
    ref = TF.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                         size=out_hw, mode="bilinear",
                         align_corners=align_corners)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)), ((17, 13), (40, 50)), ((32, 32), (7, 5)),
])
def test_nearest_parity(rng, in_hw, out_hw):
    x = rng.randn(1, *in_hw, 2).astype(np.float32)
    out = resize(jnp.asarray(x), size=out_hw, mode="nearest")
    ref = TF.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                         size=out_hw, mode="nearest")
    np.testing.assert_array_equal(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref.numpy())
