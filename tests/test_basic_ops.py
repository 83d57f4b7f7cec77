"""Golden-parity tests of the primitive ops against torch CPU.

The reference delegates these ops to torch/cuDNN; bit-level agreement of our
NHWC/XLA implementations with torch CPU (fp32, tight tolerances) is the
foundation of end-to-end mIoU parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.models import builder as mb
from image_segmentation_lab_tpu.models.basic import (BatchNorm2d, Conv2d,
                                                     GroupNorm, LayerNorm)


from helpers import to_nchw  # noqa: E402


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 0, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (1, 1, 1, 4),
])
def test_conv2d_matches_torch(rng, stride, padding, dilation, groups):
    x = rng.randn(2, 13, 11, 8).astype(np.float32)
    conv = Conv2d(8, 16, 3, stride=stride, padding=padding,
                  dilation=dilation, groups=groups, bias=True)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = conv.apply(variables, jnp.asarray(x))

    w = np.asarray(variables["params"]["weight"])  # HWIO
    b = np.asarray(variables["params"]["bias"])
    wt = torch.tensor(np.transpose(w, (3, 2, 0, 1)))  # OIHW
    ref = TF.conv2d(torch.tensor(to_nchw(x)), wt, torch.tensor(b),
                    stride=stride, padding=padding, dilation=dilation,
                    groups=groups)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw,dilation", [
    ((40, 40), 12), ((40, 40), 24), ((40, 40), 36),   # flagship ASPP @ d8
    ((40, 40), 45),                                   # taps fully outside
    ((13, 11), 5),
])
def test_dilated_slab_conv_matches_torch(rng, hw, dilation):
    """The large-dilation slab decomposition (ops/dilated_conv) must equal
    torch's dense dilated conv; padding=dilation is the ASPP configuration
    (reference models/decode_heads/aspp_head.py:31-43)."""
    from image_segmentation_lab_tpu.ops.dilated_conv import worth_it
    h, w = hw
    assert worth_it(h, w, dilation), "gate must select the slab path here"
    x = rng.randn(2, h, w, 8).astype(np.float32)
    conv = Conv2d(8, 16, 3, stride=1, padding=dilation,
                  dilation=dilation, bias=True)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = conv.apply(variables, jnp.asarray(x))

    wgt = np.asarray(variables["params"]["weight"])  # HWIO
    b = np.asarray(variables["params"]["bias"])
    wt = torch.tensor(np.transpose(wgt, (3, 2, 0, 1)))  # OIHW
    ref = TF.conv2d(torch.tensor(to_nchw(x)), wt, torch.tensor(b),
                    stride=1, padding=dilation, dilation=dilation)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref.numpy(), rtol=1e-4, atol=1e-4)


def test_slab_gate_skips_small_dilation():
    from image_segmentation_lab_tpu.ops.dilated_conv import worth_it
    assert not worth_it(40, 40, 1)     # plain conv
    assert not worth_it(40, 40, 2)     # backbone d8 stage 3
    assert not worth_it(80, 80, 4)     # backbone d8 stage 4 @ 640
    assert worth_it(40, 40, 12)        # ASPP branches @ 512/320-crop
    assert worth_it(80, 80, 24)        # ASPP @ 640


def test_batchnorm_train_and_eval_match_torch(rng):
    x = rng.randn(4, 5, 6, 3).astype(np.float32)
    bn = BatchNorm2d(3, eps=1e-5, momentum=0.1)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    tbn.train()
    ref = tbn(torch.tensor(to_nchw(x))).detach().numpy()

    out, mutated = bn.apply(variables, jnp.asarray(x), train=True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-5)
    # running stats after one step
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["running_mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["running_var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)

    # eval mode uses running stats
    tbn.eval()
    ref_eval = tbn(torch.tensor(to_nchw(x))).detach().numpy()
    variables = {**variables, "batch_stats": mutated["batch_stats"]}
    out_eval = bn.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_eval), (0, 3, 1, 2)), ref_eval,
        rtol=1e-4, atol=1e-5)


def test_groupnorm_matches_torch(rng):
    x = rng.randn(2, 4, 4, 8).astype(np.float32)
    gn = GroupNorm(num_groups=4, num_channels=8)
    variables = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = gn.apply(variables, jnp.asarray(x))
    ref = TF.group_norm(torch.tensor(to_nchw(x)), 4).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-5)


def test_activations_match_torch(rng):
    x = jnp.asarray(rng.randn(2, 7, 7, 3).astype(np.float32)) * 4
    tx = torch.tensor(np.asarray(x))
    cases = {
        "ReLU": TF.relu, "ReLU6": TF.relu6, "Sigmoid": torch.sigmoid,
        "Tanh": torch.tanh, "HSwish": TF.hardswish, "HSigmoid": TF.hardsigmoid,
        "Swish": TF.silu,
    }
    for name, tfn in cases.items():
        act = mb.build_activation_layer(dict(type=name))
        out = act.apply({}, x)
        np.testing.assert_allclose(np.asarray(out), tfn(tx).numpy(),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_build_norm_layer_naming():
    name, layer = mb.build_norm_layer(dict(type="SyncBatchNorm",
                                           requires_grad=True), 16)
    assert name == "bn"
    assert layer.num_features == 16
    name, layer = mb.build_norm_layer(dict(type="GN", num_groups=2), 16, 2)
    assert name == "gn2"
    assert layer.num_channels == 16


def test_frozen_norm_goes_to_frozen_collection(rng):
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    _, layer = mb.build_norm_layer(dict(type="BN", requires_grad=False), 8)
    variables = layer.init(jax.random.PRNGKey(0), x)
    assert "frozen_params" in variables
    assert "weight" in variables["frozen_params"]
    assert "params" not in variables or not variables["params"]
