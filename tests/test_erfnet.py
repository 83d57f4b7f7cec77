"""ERFNet + ConvTranspose2d: torch-golden numerics (beyond-reference
realtime family).

The deconv twin is torch's own ``conv_transpose2d``; block twins
re-derive mmseg's DownsamplerBlock and NonBottleneck1d with the SAME
weights pulled from the jax tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.backbones.erfnet import (
    DownsamplerBlock, NonBottleneck1d, UpsamplerBlock)
from image_segmentation_lab_tpu.models.basic.convolution import \
    ConvTranspose2d
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import (P, _t, assert_feature_parity, randomize,
                                   tbn, tconv)

torch.set_grad_enabled(False)


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (2, 2, 0, 0),
                                      (4, 2, 1, 0), (3, 1, 1, 0)])
def test_conv_transpose2d_matches_torch(rng, k, s, p, op):
    m = ConvTranspose2d(6, 4, k, stride=s, padding=p, output_padding=op)
    x = rng.randn(2, 7, 5, 6).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=141)
    out = m.apply(variables, jnp.asarray(x))
    w = np.asarray(variables["params"]["weight"])       # (kh, kw, O, I)
    ref = TF.conv_transpose2d(
        _t(x.transpose(0, 3, 1, 2)), _t(w.transpose(3, 2, 0, 1)),
        _t(np.asarray(variables["params"]["bias"])), stride=s, padding=p,
        output_padding=op)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("hw", [(16, 16), (15, 13)])   # even + odd inputs
def test_downsampler_block_matches_torch(rng, hw):
    m = DownsamplerBlock(4, 10, norm_cfg=dict(type="BN"))
    x = rng.randn(2, *hw, 4).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=142)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    p, s = variables["params"], variables["batch_stats"]
    xt = _t(x.transpose(0, 3, 1, 2))
    conv = tconv(xt, P(p, "conv/weight"), stride=2, padding=1,
                 bias=np.asarray(P(p, "conv/bias")))
    pool = TF.max_pool2d(xt, 2, 2)
    if pool.shape[2:] != conv.shape[2:]:
        pool = TF.interpolate(pool, size=conv.shape[2:], mode="bilinear",
                              align_corners=False)
    ref = TF.relu(tbn(torch.cat([conv, pool], 1), p, s, "bn"))
    assert_feature_parity(out, ref)


@pytest.mark.parametrize("dilation", [1, 4])
def test_non_bottleneck_1d_matches_torch(rng, dilation):
    m = NonBottleneck1d(8, drop_rate=0.0, dilation=dilation,
                        norm_cfg=dict(type="BN"))
    x = rng.randn(2, 9, 7, 8).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=143)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    p, s = variables["params"], variables["batch_stats"]
    d = dilation

    def cv(h, name, pad, dil):
        return TF.conv2d(h, _t(np.asarray(P(p, name + "/weight"))
                               .transpose(3, 2, 0, 1)),
                         _t(np.asarray(P(p, name + "/bias"))),
                         padding=pad, dilation=dil)

    h = _t(x.transpose(0, 3, 1, 2))
    o = TF.relu(cv(h, "conv1_v", (1, 0), 1))
    o = cv(o, "conv1_h", (0, 1), 1)
    o = TF.relu(tbn(o, p, s, "bn1"))
    o = TF.relu(cv(o, "conv2_v", (d, 0), (d, 1)))
    o = cv(o, "conv2_h", (0, d), (1, d))
    o = tbn(o, p, s, "bn2")
    ref = TF.relu(o + h)
    assert_feature_parity(out, ref)


def test_erfnet_backbone_contract(rng):
    cfg = dict(type="ERFNet", enc_downsample_channels=(8, 16, 32),
               enc_stage_non_bottlenecks=(2, 4),
               enc_non_bottleneck_dilations=(2, 4),
               dec_upsample_channels=(16, 8),
               dec_stages_non_bottleneck=(1, 1),
               dec_non_bottleneck_channels=(16, 8),
               dropout_ratio=0.0, norm_cfg=dict(type="BN"))
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x)
    outs = m.apply(variables, x, mutable=False)
    assert len(outs) == 1 and outs[0].shape == (1, 32, 32, 8)
