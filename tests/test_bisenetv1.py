"""BiSeNetV1: torch-golden numerics for the path modules and a full
backbone contract test (beyond-reference realtime family).

Twins re-derive mmseg's SpatialPath, AttentionRefinementModule and
FeatureFusionModule with the SAME weights pulled from the jax tree
(the ResNet context backbone itself is pinned by the flagship parity
suite).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.backbones.bisenetv1 import (
    AttentionRefinementModule, FeatureFusionModule, SpatialPath)
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import P, _t, assert_feature_parity, convbn, \
    randomize, tbn, tconv

torch.set_grad_enabled(False)


def test_spatial_path_matches_torch(rng):
    m = SpatialPath(3, (8, 8, 8, 16), norm_cfg=dict(type="BN"))
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=121)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    p, s = variables["params"], variables["batch_stats"]
    xt = _t(x.transpose(0, 3, 1, 2))
    h = TF.relu(tbn(tconv(xt, P(p, "layers_0/conv/weight"), stride=2,
                          padding=3), p, s, "layers_0/bn"))
    h = TF.relu(tbn(tconv(h, P(p, "layers_1/conv/weight"), stride=2,
                          padding=1), p, s, "layers_1/bn"))
    h = TF.relu(tbn(tconv(h, P(p, "layers_2/conv/weight"), stride=2,
                          padding=1), p, s, "layers_2/bn"))
    h = TF.relu(tbn(tconv(h, P(p, "layers_3/conv/weight")), p, s,
                    "layers_3/bn"))
    assert_feature_parity(out, h)
    assert out.shape == (2, 4, 4, 16)


def test_arm_matches_torch(rng):
    m = AttentionRefinementModule(10, 6, norm_cfg=dict(type="BN"))
    x = rng.randn(2, 6, 5, 10).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=122)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    p, s = variables["params"], variables["batch_stats"]
    xt = _t(x.transpose(0, 3, 1, 2))
    h = TF.relu(tbn(tconv(xt, P(p, "conv_layer/conv/weight"), padding=1),
                    p, s, "conv_layer/bn"))
    a = TF.adaptive_avg_pool2d(h, 1)
    a = tbn(tconv(a, P(p, "atten_conv/conv/weight")), p, s,
            "atten_conv/bn")
    assert_feature_parity(out, h * torch.sigmoid(a))


def test_ffm_matches_torch(rng):
    m = FeatureFusionModule(12, 8, norm_cfg=dict(type="BN"))
    sp = rng.randn(2, 6, 5, 4).astype(np.float32)
    cp = rng.randn(2, 6, 5, 8).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(sp),
                       jnp.asarray(cp))
    variables = randomize(variables, seed=123)
    out = m.apply(variables, jnp.asarray(sp), jnp.asarray(cp),
                  mutable=False)
    p, s = variables["params"], variables["batch_stats"]
    cat = torch.cat([_t(sp.transpose(0, 3, 1, 2)),
                     _t(cp.transpose(0, 3, 1, 2))], dim=1)
    fuse = TF.relu(tbn(tconv(cat, P(p, "conv1/conv/weight")), p, s,
                       "conv1/bn"))
    a = TF.adaptive_avg_pool2d(fuse, 1)
    a = TF.relu(tbn(tconv(a, P(p, "conv_atten/conv/weight")), p, s,
                    "conv_atten/bn"))
    assert_feature_parity(out, fuse * torch.sigmoid(a) + fuse)


def test_bisenetv1_backbone_contract(rng):
    cfg = dict(type="BiSeNetV1", in_channels=3,
               context_channels=(16, 32, 64),
               spatial_channels=(8, 8, 8, 16), out_indices=(0, 1, 2),
               out_channels=32,
               backbone_cfg=dict(type="ResNet", depth=18, num_stages=4,
                                 out_indices=(0, 1, 2, 3),
                                 base_channels=8, stem_channels=8),
               norm_cfg=dict(type="BN"))
    m = build_module_from_cfg(cfg, BACKBONE)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x)
    outs = m.apply(variables, x, mutable=False)
    # (ffm @1/8, context8 @1/8, context16 @1/16)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 32), (1, 8, 8, 16), (1, 4, 4, 16)]
