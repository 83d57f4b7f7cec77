"""Fast-SCNN backbone: shapes/wiring + FeatureFusionModule torch-golden
(models/backbones/fast_scnn.py; the InvertedResidual/PPM internals are
already torch-golden via the MobileNetV2/ICNet twins)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.backbones.fast_scnn import \
    FeatureFusionModule
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import _t, randomize, tbn, tconv

torch.set_grad_enabled(False)


def test_fast_scnn_shapes(rng):
    m = build_module_from_cfg(
        dict(type="FastSCNN", downsample_dw_channels=(8, 12),
             global_in_channels=16, global_block_channels=(16, 24, 32),
             global_out_channels=32, higher_in_channels=16,
             lower_in_channels=32, fusion_out_channels=32,
             norm_cfg=dict(type="BN")), BACKBONE)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    higher, lower, fusion = m.apply(variables, x)
    assert higher.shape == (2, 8, 8, 16)     # 1/8 stem
    assert lower.shape == (2, 2, 2, 32)      # 1/32 global branch
    assert fusion.shape == (2, 8, 8, 32)     # fused at 1/8


def t_ffm(params, stats, higher_nchw, lower_nchw):
    low = TF.interpolate(lower_nchw, scale_factor=4, mode="bilinear",
                         align_corners=False)
    C = low.shape[1]
    low = tconv(low, params["dwconv"]["conv"]["weight"], padding=1, groups=C)
    low = TF.relu(tbn(low, params, stats, "dwconv/bn"))
    low = tconv(low, params["conv_lower_res"]["conv"]["weight"])
    low = tbn(low, params, stats, "conv_lower_res/bn")
    high = tconv(higher_nchw, params["conv_higher_res"]["conv"]["weight"])
    high = tbn(high, params, stats, "conv_higher_res/bn")
    return TF.relu(low + high)


def test_feature_fusion_module_matches_torch(rng):
    m = FeatureFusionModule(6, 10, 8, norm_cfg=dict(type="BN"))
    higher = rng.randn(2, 8, 8, 6).astype(np.float32)
    lower = rng.randn(2, 2, 2, 10).astype(np.float32)
    variables = m.init({"params": jax.random.PRNGKey(0)},
                       jnp.asarray(higher), jnp.asarray(lower))
    variables = randomize(variables, seed=31)
    out = m.apply(variables, jnp.asarray(higher), jnp.asarray(lower))
    ref = t_ffm(variables["params"], variables.get("batch_stats", {}),
                _t(higher.transpose(0, 3, 1, 2)),
                _t(lower.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=5e-5, rtol=1e-3)
