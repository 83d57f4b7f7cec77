"""FSDP / ZeRO-3 parameter sharding (parallel/fsdp.py): parity with
plain DP, real per-chip memory reduction, and layout persistence, on
the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from image_segmentation_lab_tpu.core.builder import build_optimizer
from image_segmentation_lab_tpu.models.builder import build_segmentor
from image_segmentation_lab_tpu.parallel import get_mesh, shard_batch
from image_segmentation_lab_tpu.parallel.fsdp import (fsdp_memory_fraction,
                                                      fsdp_state_shardings,
                                                      make_fsdp_eval_step,
                                                      make_fsdp_train_step,
                                                      shard_state_fsdp)
from image_segmentation_lab_tpu.train_state import (create_train_state,
                                                    make_train_step)

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs >=4 virtual devices")


@pytest.fixture(scope="module")
def setup():
    norm = dict(type="SyncBatchNorm", requires_grad=True)
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), norm_cfg=norm,
                      base_channels=8, stem_channels=8),
        decode_head=dict(type="FCNHead", in_channels=64, in_index=3,
                         channels=16, num_convs=1, concat_input=False,
                         num_classes=2, norm_cfg=norm,
                         loss_decode=dict(type="CrossEntropyLoss")))
    model = build_segmentor(cfg)
    tx = build_optimizer(dict(type="AdamW", lr=1e-3, weight_decay=0.01))
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(4, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(r.randint(0, 2, (4, 32, 32)).astype(np.int32))
    state = create_train_state(model, jax.random.PRNGKey(0), img[:1],
                               gt[:1], tx)
    return model, tx, img, gt, state


def test_fsdp_shards_params_and_moments(setup):
    model, tx, img, gt, state = setup
    mesh = get_mesh(4, axis_names=("data",))
    sh = fsdp_state_shardings(state, mesh)
    p_specs = [s.spec for s in jax.tree_util.tree_leaves(sh.params)]
    assert any(s != P() for s in p_specs), "no parameter got sharded"
    o_specs = [s.spec for s in jax.tree_util.tree_leaves(sh.opt_state)]
    assert any(s != P() for s in o_specs)
    frac = fsdp_memory_fraction(state, mesh)
    assert frac < 0.5, frac   # most param+moment bytes sharded 4-way


def test_fsdp_step_matches_plain_dp(setup):
    model, tx, img, gt, state = setup
    single = make_train_step(model, tx, donate=False)
    s1, lv1 = single(state, img, gt, jax.random.PRNGKey(5))

    mesh = get_mesh(4, axis_names=("data",))
    fstate = shard_state_fsdp(state, mesh)
    step = make_fsdp_train_step(model, tx, mesh, state, donate=False)
    simg, sgt = shard_batch((img, gt), mesh)
    s2, lv2 = step(fstate, simg, sgt, jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(lv1["loss"]), float(lv2["loss"]),
                               rtol=1e-5)
    a = s1.params["decode_head"]["convs_0"]["conv"]["weight"]
    b = s2.params["decode_head"]["convs_0"]["conv"]["weight"]
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(jax.device_get(b)),
                               atol=1e-5, rtol=1e-4)
    # a second step keeps the sharded layout (out_shardings pin)
    s3, _ = step(s2, simg, sgt, jax.random.PRNGKey(6))
    big = [l for l in jax.tree_util.tree_leaves(s3.params)
           if getattr(l, "ndim", 0) >= 1 and l.shape[0] % 4 == 0
           and l.size >= 64]
    assert big and any(not l.sharding.is_fully_replicated for l in big)


def test_fsdp_eval_matches_single_device(setup):
    model, tx, img, gt, state = setup
    ref = model.apply(state.variables(), img, method="encode_decode")

    mesh = get_mesh(4, axis_names=("data",))
    fstate = shard_state_fsdp(state, mesh)
    eval_step = make_fsdp_eval_step(model, mesh, state)
    simg = shard_batch(img, mesh)
    out = eval_step(fstate, simg)
    np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                               np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_fsdp_transformer_step_flash_enabled():
    """The flash kernel stays enabled under FSDP (activations are
    batch-sharded; the parameter all-gathers happen in the projections,
    not inside attention): an FSDP MiT train step with the interpret
    kernel forced must match plain single-device training."""
    import os
    from image_segmentation_lab_tpu.parallel.zero import _leaf_zero_sharding

    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="MixVisionTransformer", embed_dims=8,
                      num_stages=2, num_layers=(1, 1), num_heads=(1, 2),
                      patch_sizes=(7, 3), strides=(4, 2), sr_ratios=(2, 1),
                      out_indices=(0, 1), mlp_ratio=2, drop_path_rate=0.0),
        decode_head=dict(type="SegFormerHead", in_channels=[8, 16],
                         in_index=(0, 1), input_transform="multiple_select",
                         channels=8, num_classes=2, dropout_ratio=0,
                         norm_cfg=dict(type="SyncBatchNorm",
                                       requires_grad=True),
                         loss_decode=dict(type="CrossEntropyLoss")),
        test_cfg=dict(mode="whole"))
    model = build_segmentor(cfg)
    tx = build_optimizer(dict(type="AdamW", lr=1e-3, weight_decay=0.01))
    r = np.random.RandomState(7)
    img = jnp.asarray(r.randn(4, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(r.randint(0, 2, (4, 32, 32)).astype(np.int32))
    state = create_train_state(model, jax.random.PRNGKey(0), img[:1],
                               gt[:1], tx)

    single = make_train_step(model, tx, donate=False)
    s1, lv1 = single(state, img, gt, jax.random.PRNGKey(5))  # einsum trace

    os.environ["ISLT_FLASH_ATTN_FORCE"] = "interpret"
    try:
        mesh = get_mesh(4, axis_names=("data",))
        fstate = shard_state_fsdp(state, mesh)
        step = make_fsdp_train_step(model, tx, mesh, state, donate=False)
        simg, sgt = shard_batch((img, gt), mesh)
        s2, lv2 = step(fstate, simg, sgt, jax.random.PRNGKey(5))
    finally:
        del os.environ["ISLT_FLASH_ATTN_FORCE"]

    np.testing.assert_allclose(float(lv1["loss"]), float(lv2["loss"]),
                               rtol=2e-4)
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(jax.device_get(s2.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-4, rtol=1e-3)
