"""Pooling ops vs torch golden values (incl. ceil_mode / count_include_pad)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.ops.pooling import (adaptive_avg_pool2d,
                                                    avg_pool2d, max_pool2d)


from helpers import to_nchw  # noqa: E402


@pytest.mark.parametrize("hw,k,s,p,ceil", [
    ((32, 32), 3, 2, 1, False),
    ((16, 16), 3, 2, 1, True),
    ((15, 13), 2, 2, 0, True),
    ((15, 13), 2, 2, 0, False),
])
def test_max_pool_matches_torch(rng, hw, k, s, p, ceil):
    x = rng.randn(2, *hw, 3).astype(np.float32)
    out = max_pool2d(jnp.asarray(x), k, stride=s, padding=p, ceil_mode=ceil)
    ref = TF.max_pool2d(torch.tensor(to_nchw(x)), k, s, p, ceil_mode=ceil)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref.numpy())


@pytest.mark.parametrize("hw,k,s,p,ceil,cip", [
    ((32, 32), 2, 2, 0, False, True),
    ((9, 9), 2, 2, 0, True, False),
    ((9, 9), 3, 2, 1, False, True),
    ((9, 9), 3, 2, 1, False, False),
    ((10, 7), 3, 3, 0, True, False),
])
def test_avg_pool_matches_torch(rng, hw, k, s, p, ceil, cip):
    x = rng.randn(1, *hw, 2).astype(np.float32)
    out = avg_pool2d(jnp.asarray(x), k, stride=s, padding=p, ceil_mode=ceil,
                     count_include_pad=cip)
    ref = TF.avg_pool2d(torch.tensor(to_nchw(x)), k, s, p, ceil_mode=ceil,
                        count_include_pad=cip)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("hw,out_size", [
    ((12, 12), 1), ((12, 12), 3), ((13, 9), 6), ((7, 5), (2, 3)),
])
def test_adaptive_avg_pool_matches_torch(rng, hw, out_size):
    x = rng.randn(2, *hw, 4).astype(np.float32)
    out = adaptive_avg_pool2d(jnp.asarray(x), out_size)
    ref = TF.adaptive_avg_pool2d(torch.tensor(to_nchw(x)), out_size)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref.numpy(), rtol=1e-5, atol=1e-6)


def test_avg_pool_count_include_pad_regression(rng):
    """padding=1, stride=2, size where hi-pad < padding (review finding)."""
    x = rng.randn(1, 6, 6, 1).astype(np.float32)
    out = avg_pool2d(jnp.asarray(x), 3, stride=2, padding=1,
                     count_include_pad=True)
    ref = TF.avg_pool2d(torch.tensor(to_nchw(x)), 3, 2, 1,
                        count_include_pad=True)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref.numpy(), rtol=1e-5, atol=1e-6)
