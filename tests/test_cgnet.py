"""CGNet: torch-golden numerics for the context-guided block and the
full backbone contract (beyond-reference lightweight family).

Twins re-derive mmseg's GlobalContextExtractor and ContextGuidedBlock
(loc/sur depthwise pair, concat-BN-PReLU, SE gate, downsample
bottleneck, input injection) with the SAME weights pulled from the jax
tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.backbones.cgnet import (
    ContextGuidedBlock, GlobalContextExtractor)
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import (P, _t, assert_feature_parity, randomize,
                                   tbn, tconv)

torch.set_grad_enabled(False)


def t_gce(params, x):
    b, c = x.shape[0], x.shape[1]
    y = x.mean(dim=(2, 3))
    y = TF.relu(y @ _t(params["fc1"]["weight"]) + _t(params["fc1"]["bias"]))
    y = torch.sigmoid(y @ _t(params["fc2"]["weight"])
                      + _t(params["fc2"]["bias"]))
    return x * y.view(b, c, 1, 1)


def test_gce_matches_torch(rng):
    m = GlobalContextExtractor(8, reduction=4)
    x = rng.randn(2, 5, 6, 8).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=131)
    out = m.apply(variables, jnp.asarray(x))
    ref = t_gce(variables["params"], _t(x.transpose(0, 3, 1, 2)))
    assert_feature_parity(out, ref)


def _prelu(x, w):
    return TF.prelu(x, _t(np.asarray(w)))


def t_cg_block(params, stats, x, channels, dilation, downsample):
    k, s, pad = (3, 2, 1) if downsample else (1, 1, 0)
    h = tconv(x, P(params, "conv1x1/conv/weight"), stride=s, padding=pad)
    h = tbn(h, params, stats, "conv1x1/bn")
    h = _prelu(h, P(params, "conv1x1/activate/weight"))
    loc = tconv(h, P(params, "f_loc/weight"), padding=1, groups=channels)
    sur = tconv(h, P(params, "f_sur/weight"), padding=dilation,
                dilation=dilation, groups=channels)
    joi = torch.cat([loc, sur], dim=1)
    joi = _prelu(tbn(joi, params, stats, "bn"),
                 P(params, "activate/weight"))
    if downsample:
        joi = tconv(joi, P(params, "bottleneck/weight"))
    out = t_gce(params["f_glo"], joi)
    if not downsample:
        out = x + out
    return out


@pytest.mark.parametrize("downsample", [False, True])
def test_context_guided_block_matches_torch(rng, downsample):
    in_ch, out_ch = (8, 16) if downsample else (16, 16)
    m = ContextGuidedBlock(in_ch, out_ch, dilation=2, reduction=4,
                           downsample=downsample, norm_cfg=dict(type="BN"))
    channels = out_ch if downsample else out_ch // 2
    x = rng.randn(2, 8, 8, in_ch).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=132)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    ref = t_cg_block(variables["params"], variables["batch_stats"],
                     _t(x.transpose(0, 3, 1, 2)), channels, 2, downsample)
    assert_feature_parity(out, ref)


def test_cgnet_backbone_contract(rng):
    cfg = dict(type="CGNet", num_channels=(8, 16, 32), num_blocks=(2, 3),
               dilations=(2, 4), reductions=(4, 8),
               norm_cfg=dict(type="BN"))
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x, mutable=False)
    # levels at 1/2 (stem+inject), 1/4 (2*c1+in), 1/8 (2*c2)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 8 + 3), (1, 16, 16, 2 * 16 + 3), (1, 8, 8, 2 * 32)]
