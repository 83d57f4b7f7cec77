"""PoolFormer (beyond-reference): torch-golden block numerics, backbone
contract, FPN config."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import BACKBONE
from image_segmentation_lab_tpu.models.backbones.poolformer import \
    PoolFormerBlock
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg

from test_zoo_torch_parity import P, _t, assert_feature_parity, randomize, \
    tconv

torch.set_grad_enabled(False)


def _tgn(x, p, path):
    w = torch.from_numpy(np.asarray(P(p, path + "/weight")))
    b = torch.from_numpy(np.asarray(P(p, path + "/bias")))
    return TF.group_norm(x, 1, w, b, eps=1e-5)


def t_poolformer_block(p, x, dim, ls=1e-5):
    h = _tgn(x, p, "norm1")
    h = TF.avg_pool2d(h, 3, 1, padding=1, count_include_pad=False) - h
    h = h * torch.from_numpy(np.asarray(P(p, "layer_scale_1"))).view(1, -1, 1, 1)
    x = x + h
    h = _tgn(x, p, "norm2")
    h = tconv(h, P(p, "fc1/weight"), bias=np.asarray(P(p, "fc1/bias")))
    h = TF.gelu(h)
    h = tconv(h, P(p, "fc2/weight"), bias=np.asarray(P(p, "fc2/bias")))
    h = h * torch.from_numpy(np.asarray(P(p, "layer_scale_2"))).view(1, -1, 1, 1)
    return x + h


def test_poolformer_block_matches_torch(rng):
    m = PoolFormerBlock(16)
    x = rng.randn(2, 9, 11, 16).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=211)
    out = m.apply(variables, jnp.asarray(x), mutable=False)
    ref = t_poolformer_block(variables["params"],
                             _t(x.transpose(0, 3, 1, 2)), 16)
    assert_feature_parity(out, ref)


def test_poolformer_full_backbone_matches_torch(rng):
    """Full wiring: stem + stage embeds + blocks + per-tap GN norms."""
    m = build_module_from_cfg(
        dict(type="PoolFormer", depths=(1, 1, 1, 1), dims=(8, 16, 24, 32)),
        BACKBONE)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = randomize(variables, seed=212)
    outs = m.apply(variables, jnp.asarray(x), mutable=False)
    p = variables["params"]
    h = _t(x.transpose(0, 3, 1, 2))
    refs = []
    for i, dim in enumerate((8, 16, 24, 32)):
        if i == 0:
            h = tconv(h, P(p, "patch_embed0/weight"), stride=4, padding=2,
                      bias=np.asarray(P(p, "patch_embed0/bias")))
        else:
            h = tconv(h, P(p, f"patch_embed{i}/weight"), stride=2,
                      padding=1, bias=np.asarray(P(p, f"patch_embed{i}/bias")))
        h = t_poolformer_block(p[f"stage{i}_block0"], h, dim)
        refs.append(_tgn(h, p, f"norm{i}"))
    for got, want in zip(outs, refs):
        assert_feature_parity(got, want)


def test_poolformer_backbone_contract(rng):
    m = build_module_from_cfg(
        dict(type="PoolFormer", depths=(1, 1, 2, 1), dims=(8, 16, 24, 32)),
        BACKBONE)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x, mutable=False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 24), (1, 2, 2, 32)]


def test_poolformer_frozen_stages_route_to_frozen_params(rng):
    m = build_module_from_cfg(
        dict(type="PoolFormer", depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
             frozen_stages=2), BACKBONE)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    frozen = variables.get("frozen_params", {})
    assert "patch_embed0" in frozen and "stage1_block0" in frozen
    assert "stage2_block0" in variables["params"]


def test_poolformer_fpn_config_builds():
    from image_segmentation_lab_tpu.core.fileio.parse import \
        parse_and_backup_config
    from image_segmentation_lab_tpu.models.builder import build_segmentor
    cfg = parse_and_backup_config(
        "configs/network/poolformer/fpn_poolformer_s12.py")
    model = build_segmentor(cfg["model"])
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, method="encode_decode")
    out = model.apply(variables, x, method="encode_decode", mutable=False)
    assert out.shape == (1, 64, 64, 2)
