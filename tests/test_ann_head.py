"""ANN head: SelfAttentionBlock torch-golden, PPMConcat semantics, head
wiring (models/utils/self_attention_block.py,
models/decode_heads/ann_head.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from image_segmentation_lab_tpu.core.registry_hub import DECODEHEAD
from image_segmentation_lab_tpu.models.builder import build_module_from_cfg
from image_segmentation_lab_tpu.models.decode_heads.ann_head import PPMConcat
from image_segmentation_lab_tpu.models.utils.self_attention_block import \
    SelfAttentionBlock

from test_zoo_torch_parity import _t, randomize, tconv

torch.set_grad_enabled(False)


def test_ppm_concat_matches_torch(rng):
    m = PPMConcat((1, 3, 6))
    x = rng.randn(2, 12, 12, 5).astype(np.float32)
    out = m(jnp.asarray(x))
    xt = _t(x.transpose(0, 3, 1, 2))
    refs = [TF.adaptive_avg_pool2d(xt, s).flatten(2) for s in (1, 3, 6)]
    ref = torch.cat(refs, dim=2).transpose(1, 2)     # (N, S, C)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=2e-5, rtol=1e-4)
    assert out.shape == (2, 1 + 9 + 36, 5)


def t_sab(params, query_nchw, key_nchw, channels, pool_scales,
          matmul_norm=True):
    q = tconv(query_nchw, params["query_project_0"]["weight"],
              bias=np.asarray(params["query_project_0"]["bias"]))
    k = tconv(key_nchw, params["key_project_0"]["weight"],
              bias=np.asarray(params["key_project_0"]["bias"]))
    v = tconv(key_nchw, params["value_project_0"]["weight"],
              bias=np.asarray(params["value_project_0"]["bias"]))
    N = q.shape[0]

    def ppm(x):
        return torch.cat([TF.adaptive_avg_pool2d(x, s).flatten(2)
                          for s in pool_scales], dim=2)
    k = ppm(k)                                        # (N, C, S)
    v = ppm(v)
    query = q.flatten(2).transpose(1, 2)              # (N, L, C)
    sim = query @ k
    if matmul_norm:
        sim = channels ** -0.5 * sim
    sim = TF.softmax(sim, dim=-1)
    ctx = sim @ v.transpose(1, 2)                     # (N, L, C)
    ctx = ctx.transpose(1, 2).reshape(N, -1, *q.shape[2:])
    out = tconv(ctx, params["out_project_0"]["weight"],
                bias=np.asarray(params["out_project_0"]["bias"]))
    return out


def test_self_attention_block_matches_torch(rng):
    scales = (1, 3)
    m = SelfAttentionBlock(
        key_in_channels=10, query_in_channels=14, channels=6,
        out_channels=14, key_downsample=PPMConcat(scales),
        matmul_norm=True, with_out=True)
    qf = rng.randn(2, 4, 5, 14).astype(np.float32)
    kf = rng.randn(2, 6, 6, 10).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(qf),
                       jnp.asarray(kf))
    variables = randomize(variables, seed=41)
    out = m.apply(variables, jnp.asarray(qf), jnp.asarray(kf))
    ref = t_sab(variables["params"], _t(qf.transpose(0, 3, 1, 2)),
                _t(kf.transpose(0, 3, 1, 2)), 6, scales)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=3e-5, rtol=1e-4)


def test_shared_key_query_projection():
    m = SelfAttentionBlock(
        key_in_channels=8, query_in_channels=8, channels=4, out_channels=8,
        share_key_query=True, matmul_norm=True, with_out=True)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)),
                       jnp.zeros((1, 4, 4, 8)))
    assert "key_project_0" not in variables["params"]  # shared with query


ANN_HEAD = dict(type="ANNHead", in_channels=[10, 16], in_index=[0, 1],
                input_transform="multiple_select", channels=8,
                project_channels=4, query_scales=(1,),
                key_pool_scales=(1, 3), dropout_ratio=0.0, num_classes=3,
                norm_cfg=dict(type="BN"),
                loss_decode=dict(type="CrossEntropyLoss"))


def test_ann_head_runs(rng):
    head = build_module_from_cfg(ANN_HEAD, DECODEHEAD)
    x = [jnp.asarray(rng.randn(2, 8, 8, 10).astype(np.float32)),
         jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))]
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, x)
    out = head.apply(variables, x)
    assert out.shape == (2, 4, 4, 3)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# ISANet: interlaced factorization property + head wiring
# ---------------------------------------------------------------------------


def test_isa_head_runs_and_pads(rng):
    from image_segmentation_lab_tpu.models.decode_heads.isa_head import \
        ISAHead
    cfg = dict(type="ISAHead", in_channels=12, in_index=0, channels=8,
               isa_channels=4, down_factor=(2, 2), dropout_ratio=0.0,
               num_classes=3, norm_cfg=dict(type="BN"),
               loss_decode=dict(type="CrossEntropyLoss"))
    head = build_module_from_cfg(cfg, DECODEHEAD)
    # 5x7 does not divide by (2,2): exercises the symmetric pad + crop
    x = [jnp.asarray(rng.randn(2, 5, 7, 12).astype(np.float32))]
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, x)
    out = head.apply(variables, x)
    assert out.shape == (2, 5, 7, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_isa_interlace_regroup_roundtrip(rng):
    """The global->local->restore reshape dance must be a permutation:
    with identity attention (q=k=0 -> uniform over a single sample when
    glb==1x1) the spatial layout survives exactly."""
    x = rng.randn(1, 4, 6, 3).astype(np.float32)
    N, H, W, C = x.shape
    loc_h, loc_w = 2, 3
    glb_h, glb_w = H // loc_h, W // loc_w
    a = jnp.asarray(x).reshape(N, glb_h, loc_h, glb_w, loc_w, C)
    a = a.transpose(0, 2, 4, 1, 3, 5).reshape(N * loc_h * loc_w,
                                              glb_h, glb_w, C)
    a = a.reshape(N, loc_h, loc_w, glb_h, glb_w, C)
    a = a.transpose(0, 3, 4, 1, 2, 5).reshape(N * glb_h * glb_w,
                                              loc_h, loc_w, C)
    a = a.reshape(N, glb_h, glb_w, loc_h, loc_w, C)
    a = a.transpose(0, 1, 3, 2, 4, 5).reshape(N, H, W, C)
    np.testing.assert_array_equal(np.asarray(a), x)
